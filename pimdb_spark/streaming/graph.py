"""Stateful streaming co-occurrence edge extraction — the continuous twin
of operators/graph.co_occurrence_edges, maintaining an interaction edge
stream incrementally (the feed for downstream BFS/PageRank/triangle jobs
or an upsert-merged edge table).

State per bucket key: the distinct member set, bounded by the flood cap —
O(cap) ids per key, after which only a one-bit flooded flag remains.
Each micro-batch emits only the NEW edges its arrivals create
(new x existing + new x new, src < dst).  When a bucket's membership
first exceeds the cap, the operator emits a single TOMBSTONE row
(flooded = true, NULL endpoints) and never emits from that bucket again:
batch semantics say a flooded bucket contributes no edges, but a stream
cannot retract already-emitted ones — the tombstone makes the
invalidation explicit so a downstream merge can drop the bucket's edges
(the CDC discipline, stated rather than hidden).  Within a single
drained batch the cap is applied exactly (membership is complete before
any emission), so drained-batch output equals the batch operator —
asserted by the tests, the house rule for streaming twins.

Edges are emitted per bucket; the same pair arriving via two buckets
appears once per bucket — downstream dedups on (src, dst), exactly like
the batch operator's final distinct (the natural sink is
streaming/refresh.py's upsert merge).

Scale: each micro-batch shuffles only its own rows on the bucket key;
state is bounded by cap x active buckets (add a processing-time timeout
upstream of real deployments to expire dead buckets, as
streaming/sessions.py does for users)."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("members", ArrayType(LongType())),
        StructField("flooded", BooleanType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("flooded", BooleanType()),
    ]
)


def _edges_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    max_bucket_size: int,
) -> Iterable[pd.DataFrame]:
    (bucket,) = key
    if state.exists:
        members_list, flooded = state.get
        members = set(members_list)
    else:
        members, flooded = set(), False
    arrivals: set[int] = set()
    for pdf in pdfs:
        for node in pdf["node"]:
            n = int(node)
            if n not in members:
                arrivals.add(n)
    if flooded:
        state.update(([], True))  # membership no longer needed
        return
    new_total = members | arrivals
    if len(new_total) > max_bucket_size:
        state.update(([], True))
        yield pd.DataFrame(
            {"bucket": [bucket], "src": [None], "dst": [None], "flooded": [True]}
        )
        return
    state.update((sorted(new_total), False))
    if not arrivals:
        return
    out = []
    for a in sorted(arrivals):
        for b in members:
            lo, hi = (a, b) if a < b else (b, a)
            out.append((bucket, lo, hi, False))
        for b in arrivals:
            if a < b:
                out.append((bucket, a, b, False))
    if out:
        yield pd.DataFrame(out, columns=["bucket", "src", "dst", "flooded"])


def co_occurrence_edges_stream(
    events: DataFrame,
    key_cols: list,
    node_col: str = "user_id",
    max_bucket_size: int = 20,
) -> DataFrame:
    """events -> append-mode stream of (bucket, src, dst, flooded) rows:
    new co-occurrence edges as they form, plus one tombstone per bucket
    that crosses the flood cap.  ``key_cols`` are concatenated into the
    string bucket key (rendered values must not contain '|')."""
    bucket = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    keyed = events.select(
        bucket.alias("bucket"), F.col(node_col).cast("long").alias("node")
    )

    def fn(key, pdfs, state):
        return _edges_group(key, pdfs, state, max_bucket_size)

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
