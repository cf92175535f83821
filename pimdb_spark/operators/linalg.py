"""Distributed linear algebra over embedding columns: exact Gram/scatter
matrix aggregation in int8 code space, and PCA projection built on it.

The scatter (Gram) matrix G[i,j] = sum_rows x_i * x_j is the one
aggregate PCA/whitening/linear-probing need from a 100 TB embedding
table, and it is TINY (dim x dim) however large the table is.  Computing
it in int8 code space (operators/similarity.int8_quantize: per-vector
symmetric absmax scaling) makes every product an INTEGER — the per-cell
sums are exact BIGINTs, order-free, engine-identical, with no float-fold
discipline — at the cost of working on per-vector absmax-NORMALIZED
vectors.  That is the right space when downstream similarity is cosine
(scale-invariant, the embedding-table convention everywhere else in this
repo); it is documented, not hidden.

Plan shape: each row fans out to the dim*(dim+1)/2 upper-triangle cells
via nested array transforms (JVM-side, no Python), then ONE groupBy on
(i, j) whose map-side partial combine caps every task's shuffle output
at 2,080 rows (dim=64) REGARDLESS of row count — the textbook
"aggregate to a bounded frame" shape; the exchange volume is
#tasks x 2,080, never O(n).

Reference behavior target: pimdb has no linear algebra; this extends the
embedding family (SURVEY.md beyond-parity operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Upper-triangle scatter matrix over int8 codes: (i, j, gram) with
    1 <= i <= j <= dim and gram = sum over rows of codes[i] * codes[j]
    (exact BIGINT; |code| <= 127 so a cell overflows only past ~5.7e14
    rows).  See module docstring for the code-space caveat and the
    bounded-shuffle plan shape."""
    from pimdb_spark.operators.similarity import int8_struct

    codes = F.col("_q.codes")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (F.element_at(codes, i) * F.element_at(codes, j)).alias("p"),
                ),
            ),
        )
    )
    return (
        df.select(int8_struct(F.col(vec_col)).alias("_q"))
        .select(F.explode(pairs).alias("_c"))
        .groupBy(F.col("_c.i").alias("i"), F.col("_c.j").alias("j"))
        .agg(F.sum("_c.p").alias("gram"))
    )


def pca_project(
    df: DataFrame,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Project every vector onto the top principal directions of the
    int8 code-space scatter matrix.  Returns (id, components
    array<double>) with components[c] = codes . eigvec_c.

    The eigendecomposition runs driver-side on the dim x dim Gram — a
    BOUNDED collect (2,080 values at dim=64), the same exception class
    as the kmeans centroid collect: the data-sized work (the Gram
    aggregation and the projection pass) stays distributed; only the
    O(dim^2) summary crosses the driver.  Eigenvectors broadcast back
    into the plan as one literal array; the projection is a JVM fold per
    component — no Python in the row path.

    Determinism note: numpy's eigh is deterministic for a given Gram
    (and the Gram itself is exact-integer), but eigenvector SIGN is
    conventional — fixed here by forcing each eigenvector's
    largest-magnitude coordinate positive."""
    import numpy as np

    from pimdb_spark.operators.similarity import int8_struct

    gram_rows = gram_matrix_int8(df, id_col, vec_col, dim).collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r.i - 1, r.j - 1] = r.gram
        g[r.j - 1, r.i - 1] = r.gram
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order]  # dim x n_components
    for c in range(comps.shape[1]):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]

    basis = F.array(
        *[
            F.array(*[F.lit(float(comps[d, c])) for d in range(dim)])
            for c in range(comps.shape[1])
        ]
    )
    codes = F.col("_q.codes")
    proj = F.transform(
        basis,
        lambda vec: F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(codes, i).cast("double") * F.element_at(vec, i),
        ),
    )
    return df.select(
        F.col(id_col), int8_struct(F.col(vec_col)).alias("_q")
    ).select(id_col, proj.alias("components"))


def _jl_signs(n_components: int, dim: int) -> list[list[int]]:
    """The deterministic +/-1 JL projection matrix: sign(c, i) = +1 when
    the house md5-prefix integer of "c:i" is odd.  Pure data-independent
    constants — python hashlib here, the identical ``md5`` SQL text in
    the DuckDB oracle — so both engines see the same matrix without any
    cross-engine RNG contract."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    return [
        [1 if h(f"{c}:{i}") % 2 == 1 else -1 for i in range(1, dim + 1)]
        for c in range(1, n_components + 1)
    ]


def random_project_int8(
    df: DataFrame,
    n_components: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection in int8 code space: the
    DATA-INDEPENDENT companion to pca_project (Achlioptas 2003: +/-1
    sign matrices preserve pairwise distances w.h.p.; no training pass,
    no driver round-trip, no eigen step).  Each vector's int8 codes fold
    against ``n_components`` deterministic +/-1 sign rows (md5-derived —
    see _jl_signs), so every output value is an EXACT BIGINT
    (|value| <= 127 * dim) with no float anywhere.

    Returns (id, comp INT in 1..n_components, value BIGINT) — exploded
    rows rather than an array column so the driver's value-hash covers
    every component scalar directly.

    Scale: a pure projection — zero joins, zero shuffles, no Python in
    the row path; the sign matrix is a plan literal (n_components x dim
    ints).  This is the embedding-table width-cut that needs NO model
    state at all: 64 dims -> 16 exact ints per row before any downstream
    join or sketch."""
    from pimdb_spark.operators.similarity import int8_struct

    signs = _jl_signs(n_components, dim)
    basis = F.array(
        *[
            F.array(*[F.lit(v) for v in row])
            for row in signs
        ]
    )
    codes = F.col("_q.codes")
    proj = F.transform(
        basis,
        lambda svec: F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc + F.element_at(codes, i) * F.element_at(svec, i),
        ),
    )
    return (
        df.select(F.col(id_col), int8_struct(F.col(vec_col)).alias("_q"))
        .select(id_col, F.posexplode(proj).alias("_pos", "value"))
        .select(
            id_col,
            (F.col("_pos") + 1).cast("int").alias("comp"),
            F.col("value").cast("bigint").alias("value"),
        )
    )
