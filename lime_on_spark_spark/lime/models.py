"""Models-to-explain (SURVEY.md §2j row L10): MLlib trainers.

These are the black boxes LIME explains — a 10-class logistic regression
over the 64-d embeddings (tabular path) and a Tokenizer→HashingTF→LogReg
pipeline predicting `lang` from `text` (text path). Fitted models are
cached per (session, sf_dir) so the driver's repeated query calls don't
retrain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_on_spark_spark.sources.catalog import load_table

_CACHE: dict[tuple[str, str, str], object] = {}


def _cache_key(spark: SparkSession, sf_dir: str, kind: str) -> tuple[str, str, str]:
    """Key on applicationId, not id(spark): a new session after a stop can
    reuse the same id() and would silently receive a model bound to the dead
    session's JVM. applicationId is unique per SparkContext."""
    return (spark.sparkContext.applicationId, sf_dir, kind)


def train_tabular_model(spark: SparkSession, sf_dir: str):
    """LogisticRegression on embeddings -> label (10 classes)."""
    key = _cache_key(spark, sf_dir, "tabular")
    if key not in _CACHE:
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.functions import array_to_vector

        emb = load_table(spark, sf_dir, "embeddings")
        train = emb.select(
            array_to_vector("embedding").alias("features"),
            F.col("label").cast("double").alias("label"),
        )
        lr = LogisticRegression(maxIter=50, regParam=0.01)
        _CACHE[key] = lr.fit(train)
    return _CACHE[key]


def train_text_model(spark: SparkSession, sf_dir: str):
    """Tokenizer -> HashingTF -> LogisticRegression predicting `lang`.

    Returns (pipeline_model, labels) where labels[i] is the lang string for
    model class i (StringIndexer order).
    """
    key = _cache_key(spark, sf_dir, "text")
    if key not in _CACHE:
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import HashingTF, StringIndexer, Tokenizer

        docs = load_table(spark, sf_dir, "documents").select("text", "lang")
        pipe = Pipeline(
            stages=[
                StringIndexer(inputCol="lang", outputCol="label"),
                Tokenizer(inputCol="text", outputCol="words"),
                HashingTF(inputCol="words", outputCol="features", numFeatures=1 << 16),
                LogisticRegression(maxIter=50, regParam=0.01),
            ]
        )
        model = pipe.fit(docs)
        _CACHE[key] = (model, list(model.stages[0].labels))
    return _CACHE[key]


def score_tabular(model, df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """L4 for the tabular path: black-box probabilities for each raw vector."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    scored = model.transform(df.withColumn("features", array_to_vector(raw_col)))
    return scored.withColumn("probs", vector_to_array("probability")).drop(
        "features", "rawPrediction", "probability", "prediction"
    )


def score_text(model, df: DataFrame, text_col: str = "perturbed") -> DataFrame:
    """L4 for the text path: pipeline probabilities for each perturbed text."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df.withColumnRenamed(text_col, "text"))
    return (
        scored.withColumn("probs", vector_to_array("probability"))
        .drop("words", "features", "rawPrediction", "probability", "prediction", "label")
        .withColumnRenamed("text", text_col)
    )


def train_regression_model(spark: SparkSession, sf_dir: str):
    """LinearRegression on embeddings -> a deterministic near-linear target
    (y = 3·x0 − 2·x1 + x2 + 0.1·label). Upstream LIME's mode='regression'
    needs a regressor to explain; this one is constructed so the local
    surrogate's fit quality is provable (the black box is globally linear
    in the features LIME perturbs), which the l11 verdict exploits."""
    key = _cache_key(spark, sf_dir, "regression")
    if key not in _CACHE:
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.regression import LinearRegression

        emb = load_table(spark, sf_dir, "embeddings")
        x = F.transform("embedding", lambda v: v.cast("double"))
        target = (
            3.0 * F.element_at(x, 1)
            - 2.0 * F.element_at(x, 2)
            + F.element_at(x, 3)
            + 0.1 * F.col("label").cast("double")
        )
        train = emb.select(
            array_to_vector("embedding").alias("features"),
            target.alias("label"),
        )
        lr = LinearRegression(maxIter=50, regParam=0.0)
        _CACHE[key] = lr.fit(train)
    return _CACHE[key]


def score_regression(model, df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """L4 for the regression path: black-box predicted VALUE per raw vector
    (upstream mode='regression': the ridge fits raw outputs, no softmax)."""
    from pyspark.ml.functions import array_to_vector

    scored = model.transform(df.withColumn("features", array_to_vector(raw_col)))
    return scored.withColumnRenamed("prediction", "y").drop("features")


def train_quality_model(spark: SparkSession, sf_dir: str):
    """Learned quality filter, CCNet / GPT-3 curation shape (weak labels ->
    classifier -> corpus-wide scoring).

    Weak labels come from a deterministic heuristic proxy: the type-token
    ratio q = |distinct tokens| / |tokens| (the d5 quality signal). Docs in
    the top TTR quartile are proxy-positives ("high quality": varied
    vocabulary), the bottom quartile proxy-negatives ("low quality":
    repetitive); the middle half is left unlabeled, exactly like CCNet's
    Wikipedia-vs-CommonCrawl split leaves most of the crawl unlabeled. A
    Tokenizer -> HashingTF -> LogisticRegression pipeline (seed-free LBFGS,
    deterministic) learns to predict the label from the raw text alone, so
    it can then score EVERY doc — including the unlabeled middle — in one
    distributed, JVM-side transform.

    Returns (pipeline_model, lo_cut, hi_cut) where the cuts are the exact
    0.25 / 0.75 TTR percentiles used for weak labeling (driver-held
    scalars, the only collect in the trainer).

    Scale: the percentile agg and the fit see only the corpus's text/TTR
    columns (at 100 TB you would fit on a sampled label set; the fit cost
    is bounded by the labeled quartiles either way), and scoring is a
    broadcast-model map with no shuffle.
    """
    key = _cache_key(spark, sf_dir, "quality")
    if key not in _CACHE:
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import HashingTF, Tokenizer

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        toks = F.split("text", " ")
        q = F.size(F.array_distinct(toks)) / F.size(toks)
        scored = docs.withColumn("q", q)
        lo, hi = scored.agg(
            F.expr("percentile(q, array(0.25, 0.75))").alias("cuts")
        ).first()["cuts"]
        train = scored.filter(
            (F.col("q") <= lo) | (F.col("q") >= hi)
        ).withColumn("label", (F.col("q") >= hi).cast("double"))
        pipe = Pipeline(
            stages=[
                Tokenizer(inputCol="text", outputCol="words"),
                HashingTF(
                    inputCol="words", outputCol="features", numFeatures=1 << 15
                ),
                LogisticRegression(maxIter=50, regParam=0.01),
            ]
        )
        _CACHE[key] = (pipe.fit(train), float(lo), float(hi))
    return _CACHE[key]


def score_quality(model, df: DataFrame) -> DataFrame:
    """Score a documents frame with the quality model: adds ``p_keep`` =
    P(high quality | text), dropping the pipeline's intermediate columns."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        "p_keep", F.element_at(vector_to_array("probability"), 2)
    ).drop("words", "features", "rawPrediction", "probability", "prediction")
