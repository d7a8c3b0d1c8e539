"""Count-min sketch: mergeable frequency estimation over unbounded keys.

Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005). The
sketch answers "how often did item x appear?" with a FIXED-size state
(``depth`` x ``width`` counters) regardless of cardinality — the
frequency-counting sibling of the HLL distinct sketch
(``operators/sketches.py``) and the Misra-Gries heavy-hitter summary
(``operators/frequent.py``): Misra-Gries returns the top items but
cannot answer point queries for arbitrary keys; CMS answers any point
query with a one-sided error (estimate >= true count, over-estimate
<= e*N/width with probability 1 - e^-depth).

Design (Spark-first, oracle-replayable):

- **State is SPARSE rows** ``(group..., seed, bucket, cnt)``, not a
  dense depth x width array: bounded above by ``depth*width`` rows per
  group, map-side-combinable by the ONE ``groupBy`` that builds it,
  and mergeable with a plain ``groupBy().sum()`` — the exact
  state-merge shape of ``merge_aggregate_state``. A dense array would
  force a per-group collect_list; sparse rows stay in whole-stage
  codegen end to end.
- **Hashes are md5-derived** (``md5_hash60(item || '#' || seed) %
  width``) — identical in Spark and DuckDB, so the ORACLE can rebuild
  the very same sketch and the estimates compare bit-for-bit (the same
  cross-engine trick as ``functions/similarity.md5_hash60``). A
  production deployment would swap ``xxhash64`` in via the same
  column expression (~3x cheaper; see ``fingerprint_xxhash``).
- **Estimation broadcasts the sketch**, never the data: the counters
  frame is <= depth*width*groups rows by construction, so the probe
  join is a broadcast hash join with zero shuffle of the probe side.

Scale: building is one exchange keyed (group, seed, bucket) with
partial aggregation — at 100 TB the reduce side is still only
depth*width rows per group. Merging daily sketches into monthly ones
never touches raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.functions.similarity import md5_hash60


def _require_shape(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ConfigError(
            f"count-min sketch needs depth >= 1 and width >= 2, got "
            f"depth={depth} width={width}"
        )


def cms_bucket(item: Column, seed: int, width: int) -> Column:
    """Row ``seed``'s bucket for ``item``: md5-based, cross-engine
    stable. The seed is spliced into the hashed string, giving
    ``depth`` independent-enough hash rows from one md5 family."""
    return md5_hash60(F.concat(item.cast("string"), F.lit(f"#{seed}"))) % F.lit(width)

def cms_build(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Build one count-min sketch per group as sparse counter rows
    ``(group..., seed, bucket, cnt)``.

    ONE wide projection computes all ``depth`` buckets per row, a
    ``posexplode`` fans them out, and a single map-side-combined
    ``groupBy`` folds them down — the only exchange, keyed on
    (group, seed, bucket), reduce output <= depth*width rows/group.
    ``weight_col`` turns it into a weighted sketch (sum of weights
    instead of occurrence counts)."""
    _require_shape(depth, width)
    group_cols = list(group_cols or [])
    item = F.col(item_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = F.array(*[cms_bucket(item, j, width) for j in range(depth)])
    exploded = df.select(
        *group_cols,
        F.posexplode(buckets).alias("seed", "bucket"),
        w.alias("_w"),
    )
    return exploded.groupBy(*group_cols, "seed", "bucket").agg(
        F.sum("_w").alias("cnt")
    )


def cms_merge(
    *counter_frames: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge sketches built with the SAME (depth, width): union the
    sparse rows and re-sum. Associative and commutative — the
    incremental-maintenance contract (today's sketch + state sketch),
    property-tested in tests/test_cms.py."""
    if not counter_frames:
        raise ConfigError("cms_merge needs at least one counters frame")
    group_cols = list(group_cols or [])
    out = counter_frames[0]
    for nxt in counter_frames[1:]:
        out = out.unionByName(nxt)
    return out.groupBy(*group_cols, "seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 4096,
    group_cols: list[str] | None = None,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-estimate each probe item's count: min over the sketch's
    ``depth`` rows of the probed bucket's counter (0 where the bucket
    row is absent — sparse state stores no zeros).

    The SKETCH side is broadcast (bounded at depth*width*groups rows by
    construction); the probe side keeps its partitioning — no shuffle.
    Returns ``probes`` columns + ``est_col``."""
    _require_shape(depth, width)
    group_cols = list(group_cols or [])
    item = F.col(item_col)
    buckets = F.array(*[cms_bucket(item, j, width) for j in range(depth)])
    probed = probes.select(
        "*", F.posexplode(buckets).alias("_seed", "_bucket")
    )
    bc = broadcast(counters)
    joined = probed.join(
        bc,
        on=[
            *[probed[g] == bc[g] for g in group_cols],
            probed["_seed"] == bc["seed"],
            probed["_bucket"] == bc["bucket"],
        ],
        how="left",
    )
    probe_cols = [probed[c] for c in probes.columns]
    return (
        joined.select(*probe_cols, F.coalesce(F.col("cnt"), F.lit(0)).alias("_c"))
        .groupBy(*probes.columns)
        .agg(F.min("_c").alias(est_col))
    )


def merge_cms_state(
    state: DataFrame | None,
    delta_counters: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a delta batch's counters into the CMS state table — the same
    contract as ``sketches.merge_sketch_state`` / ``incremental.
    merge_aggregate_state``: today's ``cms_build`` output folds into
    yesterday's state with one bounded groupBy-sum, so per-day sketches
    roll up to any coarser grain without rescanning raw data. Both
    frames must share (depth, width); the sparse-row sum IS the sketch
    union (exact, bit-for-bit — see tests/test_cms.py merge tests)."""
    if state is None:
        return delta_counters
    return cms_merge(state, delta_counters, group_cols=group_cols)
