"""UDF / UDAF / UDTF surface (SURVEY.md §2.K) — the deliberate escape
hatches. Everything else in this engine stays JVM-side; these four operators
exist to prove the full Python-extension surface works, each with an
oracle that recomputes the same logic in SQL.

Cost ranking (why the rest of the engine avoids these):
  pandas UDF / applyInPandas / UDTF  — Arrow batches, ~vectorized
  plain Python UDF                   — pickled row-at-a-time, 10-100× slower
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..registry import query
from ..sources.tables import table


def _normalize_text(s: str) -> str:
    """Deterministic text normalizer (row-at-a-time Python UDF body)."""
    if s is None:
        return None
    return " ".join(s.strip().lower().split())


@query(
    "udf_python_scalar",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm_text
FROM documents
""",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDF constructed lazily: the decorator parses its DDL type and needs an
    # active session, which doesn't exist at module import time.
    normalize_text = udf(_normalize_text, returnType="string")
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


def _emb_norm_pandas(emb: pd.Series) -> pd.Series:
    """Vectorized L2 norm over Arrow-delivered embedding batches."""
    import numpy as np

    return emb.map(lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype="float64") ** 2))))


@query(
    "udf_pandas_vectorized",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS nrm
FROM embeddings
""",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round(6) absorbs numpy's pairwise-summation vs the oracle's
    sequential fold (different association order, ≤1 ulp apart)."""
    emb_norm_pandas = pandas_udf(_emb_norm_pandas, "double")
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(emb_norm_pandas(F.col("embedding")), 6).alias("nrm"))


def _median_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"label": [pdf["label"].iloc[0]], "median_norm_scaled": [float(pdf["nrm_scaled"].median())]}
    )


@query(
    "udaf_applyinpandas",
    oracle="""
WITH n AS (SELECT label,
                  CAST(FLOOR(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
                             * 1000000 + 0.5) AS BIGINT) AS nrm_scaled
           FROM embeddings)
SELECT label, median(nrm_scaled) AS median_norm_scaled
FROM n GROUP BY label
""",
)
def udaf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF (per-group median — not built into a single Spark
    aggregate the oracle shares). Norms are scaled to exact ints *before*
    the Python boundary so median interpolation is float-exact both sides."""
    from .llm import norm
    from ..exprs import scaled_long

    e = table(spark, sf_dir, "embeddings")
    n = e.select("label", scaled_long(norm("embedding"), 1000000).alias("nrm_scaled"))
    return n.groupBy("label").applyInPandas(
        _median_norms, schema="label int, median_norm_scaled double"
    )


_CHUNK = 10


@query(
    "udtf_explode_custom",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[(chunk_idx*{_CHUNK}+1):(chunk_idx*{_CHUNK}+{_CHUNK})], ' ') AS chunk
FROM (SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks)/{_CHUNK}.0) AS BIGINT))) AS chunk_idx
      FROM t)
""",
)
def udtf_explode_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: chunk each document into {_CHUNK}-token windows — N
    output rows per input row (the LLM context-window chunking shape)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx bigint, chunk string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(0, (len(toks) + _CHUNK - 1) // _CHUNK):
                yield doc_id, i, " ".join(toks[i * _CHUNK : (i + 1) * _CHUNK])

    d = table(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("t20_udtf_docs")
    spark.udtf.register("t20_chunker", Chunker)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk "
        "FROM t20_udtf_docs d, LATERAL t20_chunker(d.doc_id, d.text) c"
    )


def _token_count_arrow(s: str) -> int:
    """Space-run token count (Arrow-optimized scalar UDF body). Splits on
    ' ' with empty-token filtering — exactly `string_split_regex(s, ' +')`
    — NOT str.split(), which also splits on tabs/newlines/unicode
    whitespace and would diverge from the oracle on such documents."""
    if s is None:
        return 0
    return sum(1 for t in s.split(" ") if t)


@query(
    "udf_arrow_optimized",
    oracle="""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
FROM documents
WHERE len(trim(text)) > 0
""",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 `useArrow=True`) — the
    middle tier of the Python surface: row-at-a-time author experience,
    Arrow-batched transfer (no per-row pickling), which is the default
    recommendation when a plain Python UDF can't be avoided but the logic
    doesn't vectorize. Completes the §2.K matrix alongside the pickled
    UDF, the pandas UDF, applyInPandas, and the UDTF."""
    count_tokens = udf(_token_count_arrow, returnType="long", useArrow=True)
    d = table(spark, sf_dir, "documents")
    return d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", count_tokens(F.trim(F.col("text"))).alias("n_tokens")
    )
