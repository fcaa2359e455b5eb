"""Connected components via hash-min label propagation.

The reference computes components by repeated BFS from unseen seeds
(``networkx/algorithms/components/connected.py:17-68``, ``_plain_bfs``
``:198-214``) — inherently sequential.  The distributed equivalent chosen
here (and by the north rule) is **hash-min propagation**: every vertex
starts labeled with its own id; each superstep every vertex takes the min
label over itself and its neighbors; at fixpoint the label of every vertex
is the minimum vertex id of its component.  The result is the same
partition of vertices the reference produces (components compare exactly,
up to relabeling — and our labels are even canonical: the min id).

Supersteps needed = graph diameter; web graphs are short-diameter so this
beats the extra shuffles of large-star/small-star in practice.  Each
superstep is one shuffle join (labels ⋈ symmetrized edges) + one min
aggregation, with lineage cut by :class:`SuperstepRunner`.

Directed input is rejected for the undirected API
(``@not_implemented_for("directed")``, ``connected.py:15``); use
``weakly_connected_components`` which symmetrizes first
(``components/weakly_connected.py:14``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from networkx_spark.graph import Graph, SRC, DST, ID
from networkx_spark.superstep import SuperstepRunner, fixed_plan


def _hash_min(vertices: DataFrame, adj: DataFrame, max_iter: int,
              checkpoint_dir: Optional[str], checkpoint_interval: int,
              resume: bool, salt_threshold: Optional[int] = None,
              n_salts: int = 16,
              runner: Optional[SuperstepRunner] = None) -> DataFrame:
    from networkx_spark.partitioning import (SALT, hot_keys, replicate_state,
                                             salt_rows)
    spark = vertices.sparkSession
    if runner is None:
        # callers may pass their own runner to observe per-superstep
        # metrics (the scaling protocol does) — same contract as pagerank
        runner = SuperstepRunner(checkpoint_dir, name="cc_state",
                                 interval=checkpoint_interval)
    # neighbor pairs both ways so min flows in both directions; cached
    # pre-partitioned on the join key so supersteps shuffle only labels
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbrs = (adj.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr"))
            .union(adj.select(F.col(DST).alias(ID), F.col(SRC).alias("nbr"))))
    hot = None
    join_keys = [ID]
    if salt_threshold is not None:
        # hot-vertex salting (partitioning.py): spread each hot vertex's
        # adjacency rows across n_salts partitions; labels of hot vertices
        # are replicated per salt each superstep
        hot = hot_keys(nbrs, ID, salt_threshold).cache()
        nbrs = salt_rows(nbrs, hot, ID, "nbr", n_salts)
        join_keys = [ID, SALT]
        nbrs = nbrs.repartition(n_part, ID, SALT).cache()
    else:
        nbrs = nbrs.repartition(n_part, ID).cache()
    # bucketed snapshots: the label re-read keeps HashPartitioning(id), so
    # the scatter join against the co-partitioned cached adjacency and the
    # label-update join need no exchange — the min-agg partials are the
    # superstep's only shuffle (see SuperstepRunner.enable_bucketing)
    runner.enable_bucketing([ID], n_part)
    labels = vertices.select(ID, F.col(ID).alias("component"))
    if runner.bucket_cols:
        # pre-partition only for bucketed snapshots (one file per bucket);
        # a plain parquet re-read forgets partitioning, so the exchange
        # would buy nothing in the default mode
        labels = labels.repartition(n_part, ID)
    n = vertices.count()          # constant state cardinality: skip the
    start = 0                     # per-superstep count job in checkpoint()
    if resume:
        step, saved = runner.latest(spark)
        if saved is not None:
            labels, start = saved.select(ID, "component"), step + 1
    labels = runner.cut(labels)
    try:
      with fixed_plan(spark):
        for it in range(start, start + max_iter):
            # min over own label and every neighbor's label
            lab = (replicate_state(labels, hot, ID, n_salts)
                   if hot is not None else labels)
            nbr_min = (lab.join(nbrs, join_keys)
                       .groupBy(F.col("nbr").alias(ID))
                       .agg(F.min("component").alias("_nc")))
            # the change count rides the checkpoint write as an observed
            # metric (CollectMetrics) — ONE Spark job per superstep, no
            # separate join+count pass, and ``_chg`` never hits parquet
            new = (labels.join(nbr_min, ID, "left")
                   .select(ID, F.least(F.col("component"),
                                       F.coalesce("_nc", F.col("component"))).alias("component"),
                           (F.coalesce("_nc", F.col("component"))
                            < F.col("component")).cast("long").alias("_chg")))
            obs = Observation()
            new = runner.checkpoint(
                new.observe(obs, F.sum("_chg").alias("chg")).drop("_chg"),
                it, rows=n, extra={"algorithm": "connected_components"})
            changed = int(obs.get["chg"] or 0)
            runner.update_last(residual=float(changed), changed=changed)
            labels = new
            if changed == 0:
                return labels
        raise RuntimeError(f"hash-min did not converge in {max_iter} supersteps")
    finally:
        nbrs.unpersist()
        if hot is not None:
            hot.unpersist()
        runner.close()


def connected_components(g: Graph, max_iter: int = 200,
                         checkpoint_dir: Optional[str] = None,
                         checkpoint_interval: int = 1,
                         resume: bool = False,
                         salt_threshold: Optional[int] = None,
                         n_salts: int = 16,
                         runner=None) -> DataFrame:
    """(id, component) — component = min vertex id of the component.

    ``salt_threshold`` enables hot-vertex salting (partitioning.py):
    vertices with more than that many adjacency rows are spread across
    ``n_salts`` shuffle partitions — results are identical, only physical
    placement changes.  Raises on directed input like the reference
    (``connected.py:15``) and on an empty graph
    (``NetworkXPointlessConcept`` analogue for ``is_connected``, here only
    the empty-graph guard of the generator).
    """
    if g.directed:
        raise ValueError("connected_components is not implemented for directed graphs; "
                         "use weakly_connected_components")
    return _hash_min(g.vertices(), g.edges, max_iter,
                     checkpoint_dir, checkpoint_interval, resume,
                     salt_threshold, n_salts, runner=runner)


def weakly_connected_components(g: Graph, max_iter: int = 200,
                                checkpoint_dir: Optional[str] = None,
                                checkpoint_interval: int = 1,
                                resume: bool = False,
                                salt_threshold: Optional[int] = None,
                                n_salts: int = 16) -> DataFrame:
    """Directed graphs: components of the symmetrized graph
    (``weakly_connected.py:14``, BFS over succ+pred ``:163+``)."""
    if not g.directed:
        raise ValueError("use connected_components for undirected graphs")
    return _hash_min(g.vertices(), g.edges, max_iter,
                     checkpoint_dir, checkpoint_interval, resume,
                     salt_threshold, n_salts)


def number_connected_components(g: Graph, **kw) -> int:
    """Reference ``connected.py:73``."""
    return connected_components(g, **kw).select("component").distinct().count()


def is_connected(g: Graph, **kw) -> bool:
    """Reference ``connected.py:113``; raises on the empty graph."""
    if g.number_of_vertices() == 0:
        raise ValueError("connectivity is undefined for the null graph "
                         "(reference: NetworkXPointlessConcept)")
    return number_connected_components(g, **kw) == 1


def component_sizes(g: Graph, **kw) -> DataFrame:
    """(component, size) — the reference test idiom ``sorted(cc, key=len)``
    (``connected.py:41``) as an aggregation."""
    return (connected_components(g, **kw)
            .groupBy("component").agg(F.count("*").alias("size")))


def largest_component(g: Graph, **kw) -> DataFrame:
    """Vertices of the largest component — ``max(cc, key=len)``
    (``connected.py:47``) as orderBy+limit on the size table."""
    cc = connected_components(g, **kw).cache()
    top = (cc.groupBy("component").agg(F.count("*").alias("size"))
           .orderBy(F.desc("size"), "component").limit(1))
    return cc.join(F.broadcast(top.select("component")), "component", "semi").select(ID)
