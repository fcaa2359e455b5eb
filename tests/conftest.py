import sys

import pytest

# The reference tree is the golden ORACLE only (FIXTURES.md §3: "the
# reference algorithms are the golden implementation") — imported for
# expected values in tests, never copied into the engine.
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from networkx_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("networkx-spark-tests", cores=4, shuffle_partitions=4,
                  extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1MB"})
    yield s


def as_dict(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def as_partition(df, key, val):
    """frozenset-of-frozensets view, label-invariant (reference test posture
    for components/communities)."""
    groups = {}
    for r in df.collect():
        groups.setdefault(r[val], set()).add(r[key])
    return frozenset(frozenset(g) for g in groups.values())
