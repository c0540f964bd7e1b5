"""GPT-3-style quality classifier: logistic regression on hashed
bag-of-ngrams features, trained to separate a trusted corpus from the raw
crawl, used to score (and Pareto-admit) raw documents.

Published recipe (GPT-3 appendix A; reused by PaLM/Llama data work): train
a linear classifier with the trusted set as positives and the crawl as
negatives, score every crawl document, keep a document if
``score > 1 - pareto_sample()`` so selection is biased to high scores but
keeps a long tail for diversity. The reference engine has no classifier
surface; this extends the data-selection family (``operators/dsir.py`` is
the importance-weights flavor of the same hashed feature space — features
are shared via ``dsir.doc_features``).

Scale shape:

* **Features** are the DSIR hashed unigram+bigram buckets — map-side
  explode, multiplicity preserved.
* **Training is full-batch gradient descent as a driver loop of
  aggregations**: each round broadcasts the weight vector (≤ n_buckets
  float64 — bounded, like the IVF centroids), computes per-doc logits with
  one equi-join + agg, and reduces the gradient map-side to ≤ n_buckets
  rows. Driver state = the weight vector, never rows. Rounds are few
  (logistic regression on hashed text features converges in tens of
  full-batch steps with L2).
* **Scoring is one broadcast join + agg** (same plan as LM scoring).
* **Training has no SQL twin** (iterative — the WRatio/bpe_merges class);
  correctness is pinned by a property test against an independent numpy
  reference on the same design matrix, plus planted-separation tests.
  The deterministic Pareto admission rule (md5-uniform inversion,
  ``u^(-1/alpha)``) is a pure map-side filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.lm import DEFAULT_BUCKETS
from .dsir import doc_features


def _assemble(
    raw: DataFrame,
    trusted: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    salt: str,
) -> DataFrame:
    """(label, row_id, bucket, cnt) training rows: trusted=1, raw=0.
    Row identity is (label, id) so id spaces may overlap between sides."""
    f_raw = doc_features(raw, id_col, text_col, n_buckets, salt).select(
        F.lit(0).alias("label"), F.col(id_col).alias("row_id"), "bucket"
    )
    f_tru = doc_features(trusted, id_col, text_col, n_buckets, salt).select(
        F.lit(1).alias("label"), F.col(id_col).alias("row_id"), "bucket"
    )
    return (
        f_raw.unionByName(f_tru)
        .groupBy("label", "row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_quality_classifier(
    raw: DataFrame,
    trusted: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
    n_iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> DataFrame:
    """Train the logistic classifier; returns the weight table
    ``(bucket, weight)`` (bias at bucket = -1). Each iteration is one
    broadcast-join + two map-side-combined aggs over the feature rows;
    the weight vector (≤ n_buckets doubles) is the only driver state.

    Features are count-log-scaled (``1 + ln(cnt)``) and rows are
    length-normalized by their feature count, the standard linear-text
    conditioning, so step size is corpus-size-independent."""
    spark = raw.sparkSession
    base = _assemble(raw, trusted, id_col, text_col, n_buckets, salt)
    norm = base.withColumn(
        "x",
        (F.lit(1.0) + F.log(F.col("cnt").cast("double")))
        / F.sqrt(
            F.sum(
                (F.lit(1.0) + F.log(F.col("cnt").cast("double"))) ** 2
            ).over(Window.partitionBy("label", "row_id"))
        ),
    ).select("label", "row_id", "bucket", "x")
    # bias as feature: one (bucket = -1, x = 1) row per training row makes
    # the bias gradient ride in the SAME aggregation as the weights, so
    # every iteration is exactly ONE Spark action
    bias_rows = norm.select("label", "row_id").distinct().select(
        "label", "row_id", F.lit(-1).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    feats = norm.unionByName(bias_rows).localCheckpoint(eager=True)
    n_rows = bias_rows.count()
    if n_rows == 0:
        return spark.createDataFrame([], "bucket bigint, weight double")

    weights: dict[int, float] = {}
    for _ in range(int(n_iters)):
        if weights:
            w_df = F.broadcast(
                spark.createDataFrame(
                    list(weights.items()), "bucket bigint, weight double"
                )
            )
            scored = feats.join(w_df, "bucket", "left").withColumn(
                "wx", F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("x")
            )
        else:
            scored = feats.withColumn("wx", F.lit(0.0))
        resid = (
            scored.groupBy("label", "row_id")
            .agg(F.sum("wx").alias("z"))
            .select(
                "label",
                "row_id",
                (
                    F.col("label").cast("double")
                    - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                ).alias("r"),
            )
        )
        grad_rows = (
            feats.join(resid, ["label", "row_id"])
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
            .collect()
        )
        scale = lr / n_rows
        decay = 1.0 - lr * l2
        # grad_rows covers every bucket with a feature row (the design
        # matrix is fixed), so this is a complete update
        weights = {
            int(row["bucket"]):
                decay * weights.get(int(row["bucket"]), 0.0)
                + scale * row["g"]
            for row in grad_rows
        }
    rows = list(weights.items())
    if -1 not in weights:
        rows.append((-1, 0.0))
    return spark.createDataFrame(rows, "bucket bigint, weight double")


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """Score documents with a trained weight table: ``(id_col, score)``
    where score = sigmoid(w·x + b) in (0, 1), higher = more trusted-like.
    One broadcast join + one doc-keyed agg; zero-feature docs are absent
    (nothing to score). The feature conditioning mirrors training."""
    feats = (
        doc_features(docs, id_col, text_col, n_buckets, salt)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "x",
            (F.lit(1.0) + F.log(F.col("cnt").cast("double")))
            / F.sqrt(
                F.sum(
                    (F.lit(1.0) + F.log(F.col("cnt").cast("double"))) ** 2
                ).over(Window.partitionBy(id_col))
            ),
        )
    )
    w = F.broadcast(weights.where(F.col("bucket") >= 0))
    bias_rows = weights.where(F.col("bucket") == -1).collect()
    bias = float(bias_rows[0]["weight"]) if bias_rows else 0.0
    return (
        feats.join(w, "bucket", "left")
        .groupBy(id_col)
        .agg(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.sum(
                                F.coalesce(F.col("weight"), F.lit(0.0))
                                * F.col("x")
                            )
                            + F.lit(bias)
                        )
                    )
                )
            ).alias("score")
        )
    )


def pareto_admit(
    scored: DataFrame,
    id_col: str = "doc_id",
    alpha: float = 9.0,
    salt: str = "pareto",
) -> DataFrame:
    """GPT-3's admission rule, deterministic: keep a document iff
    ``score > 1 - pareto_draw`` with the Pareto(α) draw inverted from the
    md5 uniform (``u^(-1/α) - 1``, rescan-stable like every sampling verb
    in ``functions/sampling.py``). High scores always pass; low scores
    pass with the Pareto tail's probability, preserving diversity."""
    from ..functions.sampling import deterministic_uniform

    u = deterministic_uniform(id_col, salt)
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return scored.where(F.col("score") > F.lit(1.0) - draw)
