"""UDF / UDAF / UDTF surface (SURVEY.md §2.B "UDF / UDAF / UDTF surface").

Scale notes: q_udf_python is the ONE deliberate row-at-a-time Python UDF (it
exists to test that surface); everything else Python-side is Arrow-batched
(pandas UDFs — 10-100× the throughput of per-row pickling). Built-ins remain
the default everywhere else in this package.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType

from ..registry import query
from .common import r4, t

# Return types are DataType objects, not DDL strings: string return types are
# parsed via the active SparkContext at decoration time, which would make this
# module (and therefore registry.collect()) unimportable before a session
# exists — the driver may call queries() first.


@udf(DoubleType())
def _charge_py(price: float, discount: float, tax: float) -> float:
    """Row-at-a-time scalar Python UDF (deterministic arithmetic)."""
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "q_udf_python",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def q_udf_python(spark, sf_dir):
    """Scalar Python UDF — bounded input (the per-row path is the test
    subject, not the recommended engine path).

    Rounded to 6 decimals, not 4: the product of 2-dp factors has exactly 6
    decimal digits, so rounding at 4 lands on exact .5 ties where Spark
    (HALF_UP) and DuckDB disagree; at 6 there is no tie to break."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_charge_py("l_extendedprice", "l_discount", "l_tax"), 6).alias("charge"),
    )


@pandas_udf(DoubleType())
def _log1p_pd(price: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) pandas UDF."""
    import numpy as np

    return pd.Series(np.log1p(price.to_numpy()))


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(1 + l_extendedprice), 4) AS log_price
    FROM lineitem
    """,
)
def q_udf_pandas(spark, sf_dir):
    """Vectorized pandas UDF over the full lineitem table."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(_log1p_pd("l_extendedprice")).alias("log_price"),
    )


@pandas_udf(DoubleType())
def _weighted_mean_pd(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg pandas UDF: quantity-weighted mean price."""
    q = qty.to_numpy()
    return float((price.to_numpy() * q).sum() / q.sum())


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark, sf_dir):
    """Grouped-aggregate pandas UDF (custom weighted mean per return flag)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(_weighted_mean_pd("l_extendedprice", "l_quantity")).alias(
            "weighted_avg_price"
        )
    )


class _TokenizeUdtf:
    """Python UDTF: one output row per whitespace token with its position.

    Decorated lazily inside :func:`q_udtf` — ``@udtf`` with a DDL returnType
    needs an active session to parse the schema."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield i, tok


@query(
    "q_udtf",
    oracle="""
    SELECT d.doc_id,
           CAST(t.i - 1 AS INT) AS pos,
           t.tok AS token
    FROM documents d,
         LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok,
                         generate_subscripts(string_split(d.text, ' '), 1) AS i) t
    WHERE d.doc_id <= 100
      AND d.text IS NOT NULL AND d.text <> ''
    """,
)
def q_udtf(spark, sf_dir):
    """Table-valued function via LATERAL join (Spark ≥3.5 @udtf)."""
    spark.udtf.register("icsb_tokenize", udtf(_TokenizeUdtf, returnType="pos: int, token: string"))
    t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, tk.pos, tk.token
        FROM _udtf_docs d, LATERAL icsb_tokenize(d.text) tk
        """
    )


@query(
    "q_udf_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net,
           round(l_quantity * l_extendedprice, 4) AS volume
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def q_udf_arrow(spark, sf_dir):
    """``mapInArrow``: the lowest-level Python batch API — the function
    receives raw ``pyarrow.RecordBatch`` objects (no pandas conversion at
    all) and yields batches back. The right surface when the Python side
    is itself Arrow-native (pyarrow.compute, DuckDB, polars, ray data):
    it skips the pandas materialization both ways, which is the dominant
    cost of a pandas UDF whose compute is trivial.

    Completes the Python-eval surface matrix: row-at-a-time (q_udf_python)
    / pandas scalar (q_udf_pandas) / pandas grouped-agg (q_udaf_pandas) /
    table function (q_udtf) / Arrow-batch (here). Map-only: partition
    count, ordering and pruning are unaffected; arithmetic runs in
    pyarrow.compute's vectorized kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_fn(batches):
        for b in batches:
            net = pc.round(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                ),
                ndigits=4,
            )
            volume = pc.round(
                pc.multiply(b.column("l_quantity"), b.column("l_extendedprice")),
                ndigits=4,
            )
            # the declared Spark schema says long/long/double/double —
            # cast the int32 line number up front (Arrow types must match
            # the declared schema exactly; Spark reads the vectors raw)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber").cast(pa.int64()),
                    net,
                    volume,
                ],
                ["l_orderkey", "l_linenumber", "net", "volume"],
            )

    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
            "l_quantity",
        )
    )
    return src.mapInArrow(
        batch_fn,
        "l_orderkey long, l_linenumber long, net double, volume double",
    )


@query(
    "q_udf_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4)
             AS charged,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def q_udf_map_in_pandas(spark, sf_dir):
    """``mapInPandas``: the iterator-of-DataFrames batch API — the
    surface for per-PARTITION Python logic that needs whole batches
    (model inference, library calls that amortize setup per batch)
    rather than per-row or per-group slices.  The function streams
    pandas frames in and yields frames out, so peak memory is one Arrow
    batch, not one partition.

    Completes the Python-eval surface matrix alongside row-at-a-time
    (q_udf_python) / pandas scalar (q_udf_pandas) / grouped-agg
    (q_udaf_pandas) / table function (q_udtf) / Arrow-batch
    (q_udf_arrow).  The compute here is stateless per row, so batch
    boundaries cannot affect values — the determinism contract every
    mapInPandas stage in this repo follows (llm/multimodal.py).

    Map-only: pruning/partitioning unaffected; the l_orderkey filter
    still pushes to the scan below the Python stage."""
    import numpy as np

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "l_tax", "l_quantity",
    )

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            x = (
                pdf["l_extendedprice"]
                * (1 - pdf["l_discount"])
                * (1 + pdf["l_tax"])
            ).to_numpy()
            charged = np.copysign(np.floor(np.abs(x) * 1e4 + 0.5) / 1e4, x)
            band = np.select(
                [pdf["l_quantity"] >= 40, pdf["l_quantity"] >= 10],
                ["bulk", "mid"],
                default="small",
            )
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "charged": charged,
                    "qty_band": band,
                }
            )

    return li.mapInPandas(
        fn,
        "l_orderkey long, l_linenumber long, charged double, qty_band string",
    )
