"""Model-based document quality filtering: a distributed classifier
trained on cheap heuristic ("silver") labels, then applied corpus-wide.

This is the fastText-style quality-classifier stage of an LLM data
pipeline (GPT-3/LLaMA-style "classify against a high-quality reference
corpus"), built entirely on Spark primitives: featurization is a
single JVM-side projection of the text-signal Columns in
:mod:`openoa_spark.datapipe.text`, training is MLlib
``LogisticRegression`` over an assembled vector, and scoring is a
distributed ``model.transform`` — no Python in the hot path at either
train or apply time.

No reference counterpart (training-data pipeline extension; the
reference's ML harness is regression-only — see
``openoa_spark/ml.py`` for that parity surface).

Scale notes:
- featurize: map-only projection, no shuffle.
- fit: MLlib L-BFGS over the feature vectors — O(iterations) passes,
  each a tree-aggregated gradient; no driver-side row collection.
- score: map-only transform; the model broadcasts (a few KB).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame, functions as F

from openoa_spark.datapipe import text

FEATURE_COLS = [
    "f_tokens",
    "f_avg_word_len",
    "f_punct_ratio",
    "f_stopword_ratio",
    "f_repetition",
    "f_entropy",
]


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the six standard quality-signal features as one map-only
    projection (token count, average word length, punctuation ratio,
    stopword ratio, 2-gram repetition, char entropy). NULL-safe: null
    or empty text featurizes to zeros rather than nulls (MLlib
    assemblers reject NaN/null rows)."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    # the ratio signals divide by length/token counts — under ANSI an
    # empty doc raises DIVIDE_BY_ZERO, so featurize a single space and
    # zero the token count explicitly
    c = F.when(F.length(F.trim(raw)) > 0, raw).otherwise(F.lit(" "))
    nz = lambda col: F.coalesce(col, F.lit(0.0))  # noqa: E731
    return df.withColumns(
        {
            "f_tokens": F.when(
                F.length(F.trim(raw)) > 0, text.token_count(raw)
            ).otherwise(F.lit(0)).cast("double"),
            "f_avg_word_len": nz(text.avg_word_length(c)),
            "f_punct_ratio": nz(text.punctuation_ratio(c)),
            "f_stopword_ratio": nz(
                text.stopword_ratio(c, text.STOPWORDS["en"])
            ),
            "f_repetition": nz(text.repetition_ratio(c, 2)),
            "f_entropy": nz(text.char_entropy(c)),
        }
    )


def silver_labels(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_repetition: float = 0.3,
) -> DataFrame:
    """Heuristic 0/1 quality labels — the cheap "silver" supervision a
    pipeline bootstraps from when no human-labeled reference corpus
    exists: :func:`text.quality_score` above ``threshold`` AND 2-gram
    repetition below ``max_repetition`` (quality_score alone passes
    long low-punctuation spam like "buy now buy now ..."; the Gopher
    repetition gate catches exactly that class). Map-only."""
    raw = F.col(text_col)
    # empty/null docs are low quality BY DEFINITION — and must not
    # reach the ratio signals, which (a) divide by zero under ANSI on
    # empty text and (b) null-skip inside least/greatest for NULL text,
    # which would silently label garbage rows 1.0
    blank = raw.isNull() | (F.length(F.trim(raw)) == 0)
    return df.withColumn(
        "label",
        F.when(blank, F.lit(0.0)).otherwise(
            (
                (text.quality_score(raw) >= F.lit(threshold))
                & (text.repetition_ratio(raw, 2) < F.lit(max_repetition))
            ).cast("double")
        ),
    )


def fit_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> PipelineModel:
    """Train the quality classifier: assemble → standardize → logistic
    regression. Input must already carry :data:`FEATURE_COLS` (run
    :func:`featurize`) and a 0/1 ``label_col``."""
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=FEATURE_COLS, outputCol="_features_raw"
            ),
            StandardScaler(
                inputCol="_features_raw",
                outputCol="_features",
                withMean=True,
                withStd=True,
            ),
            LogisticRegression(
                featuresCol="_features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_documents(
    df: DataFrame,
    model: PipelineModel,
    text_col: str = "text",
    keep_features: bool = False,
) -> DataFrame:
    """Apply a fitted classifier corpus-wide: adds ``quality_prob``
    (P(high quality)) and ``quality_pred`` (0/1 at the model's 0.5
    boundary). Featurizes internally if the feature columns are
    absent, so callers can score a raw corpus directly. Distributed
    transform — the model broadcasts, rows never leave executors."""
    if not set(FEATURE_COLS) <= set(df.columns):
        df = featurize(df, text_col)
    scored = model.transform(df)
    # probability is an MLlib vector; element 1 = P(label=1)
    from pyspark.ml.functions import vector_to_array

    out = scored.withColumn(
        "quality_prob",
        F.round(vector_to_array(F.col("probability")).getItem(1), 6),
    ).withColumn(
        "quality_pred", F.col("prediction").cast("int")
    )
    drop = ["_features_raw", "_features", "rawPrediction", "probability",
            "prediction"]
    if not keep_features:
        drop += FEATURE_COLS
    return out.drop(*drop)
