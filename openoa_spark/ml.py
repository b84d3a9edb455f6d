"""ML harness: distributed regressors with randomized hyperparameter
search, mirroring the reference's model zoo on MLlib.

Parity target (behavior only): openoa/utils/machine_learning_setup.py:
62-212 — {"etr": ExtraTreesRegressor, "gbm": GradientBoostingRegressor,
"gam": pygam.GAM} with fixed hyperparameter ranges, tuned by
RandomizedSearchCV(n_iter=20, KFold(5), R²).

MLlib mapping (documented substitutes):
- "etr"  → RandomForestRegressor (closest distributed analogue of
           ExtraTrees: bagged randomized trees)
- "gbm"  → GBTRegressor
- "linear" → LinearRegression (elasticNet grid)
- "gam"  → not available distributed; the pipelines use the
           polynomial-basis OLS in analysis/tie.py instead.

The random search draws ``n_iter`` parameter maps from the grid (the
reference's RandomizedSearchCV semantics) and scores each with
CrossValidator's R² on ``num_folds`` folds.
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


_HYPER_RANGES = {
    # mirrors machine_learning_setup.py:96-135 ranges, renamed to MLlib params
    "etr": {
        "numTrees": [10, 50, 100, 200],
        "maxDepth": [4, 8, 12, 20],
        "minInstancesPerNode": [1, 2, 4],
        "subsamplingRate": [0.5, 0.8, 1.0],
    },
    "gbm": {
        "maxIter": [10, 50, 100],
        "maxDepth": [2, 4, 6, 8],
        "stepSize": [0.01, 0.05, 0.1, 0.3],
        "subsamplingRate": [0.5, 0.8, 1.0],
    },
    "linear": {
        "regParam": [0.0, 0.01, 0.1, 1.0],
        "elasticNetParam": [0.0, 0.5, 1.0],
    },
}


@dataclass
class MachineLearningSetup:
    """Wrap an MLlib regressor with the reference's hyperparameter
    ranges; ``hyper_optimize`` runs the randomized CV search."""

    algorithm: str = "etr"
    feature_cols: list[str] = field(default_factory=list)
    label_col: str = "label"
    seed: int = 42

    def __post_init__(self):
        if self.algorithm not in _HYPER_RANGES:
            raise ValueError(
                f"unknown algorithm {self.algorithm!r}; choose from {sorted(_HYPER_RANGES)} "
                "(the reference's 'gam' has no distributed analogue — see analysis/tie.py)"
            )
        self.hyper_range = _HYPER_RANGES[self.algorithm]
        self.opt_model = None
        self.opt_params: dict = {}
        self.cv_results: list[tuple[float, dict]] = []

    def _estimator(self):
        from pyspark.ml.regression import (
            GBTRegressor,
            LinearRegression,
            RandomForestRegressor,
        )

        kw = dict(featuresCol="_features", labelCol=self.label_col, seed=self.seed)
        if self.algorithm == "etr":
            return RandomForestRegressor(**kw)
        if self.algorithm == "gbm":
            return GBTRegressor(**kw)
        kw.pop("seed")
        return LinearRegression(**kw)

    def _assemble(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import VectorAssembler

        return VectorAssembler(
            inputCols=self.feature_cols, outputCol="_features"
        ).transform(df)

    def hyper_optimize(
        self,
        df: DataFrame,
        n_iter_search: int = 20,
        num_folds: int = 5,
        parallelism: int = 4,
    ):
        """Randomized hyperparameter search with K-fold CV and R²
        scoring (machine_learning_setup.py:162-212). Returns the
        refitted best model."""
        from pyspark.ml.evaluation import RegressionEvaluator
        from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

        est = self._estimator()
        rng = _random.Random(self.seed)
        names = sorted(self.hyper_range)
        seen: set[tuple] = set()
        draws: list[dict] = []
        import math

        budget = min(n_iter_search, math.prod(len(self.hyper_range[k]) for k in names))
        while len(draws) < budget:
            combo = tuple(rng.choice(self.hyper_range[k]) for k in names)
            if combo in seen:
                continue
            seen.add(combo)
            draws.append(dict(zip(names, combo)))
        grid = []
        for d in draws:
            m = ParamGridBuilder()
            for k, v in d.items():
                m = m.baseOn((est.getParam(k), v))
            grid.extend(m.build())

        assembled = self._assemble(df).select("_features", self.label_col)
        evaluator = RegressionEvaluator(
            labelCol=self.label_col, predictionCol="prediction", metricName="r2"
        )
        cv = CrossValidator(
            estimator=est, estimatorParamMaps=grid, evaluator=evaluator,
            numFolds=num_folds, parallelism=parallelism, seed=self.seed,
        )
        model = cv.fit(assembled)
        self.cv_results = sorted(
            ((m, d) for m, d in zip(model.avgMetrics, draws)),
            key=lambda t: -t[0],
        )
        self.opt_model = model.bestModel
        self.opt_params = self.cv_results[0][1]
        return self.opt_model

    def hyper_report(self, top_k: int = 5) -> list[str]:
        """Top-k CV results (machine_learning_setup.py:137-160)."""
        return [
            f"R2 {m:.4f}  {params}" for m, params in self.cv_results[:top_k]
        ]

    def predict(self, df: DataFrame) -> DataFrame:
        if self.opt_model is None:
            raise RuntimeError("call hyper_optimize first")
        return self.opt_model.transform(self._assemble(df))


def time_series_splits(
    df,
    time_col: str,
    n_splits: int = 5,
    min_train_frac: float = 0.3,
):
    """Leakage-free expanding-window cross-validation splits for
    time-ordered data (sklearn TimeSeriesSplit analog): yields
    ``(train_df, test_df)`` pairs where every training row precedes
    every test row in event time — random K-fold on telemetry leaks
    the future into training and inflates scores.

    Boundaries come from ONE min/max aggregate (timestamps divided
    evenly over [min_train_frac, 1]); each split is a pair of pushed-
    down time filters over the same lazy frame, so no data moves until
    the caller acts on a split.
    """
    from pyspark.sql import functions as F

    if not 1 <= n_splits:
        raise ValueError("n_splits must be >= 1")
    b = df.agg(
        F.min(F.unix_micros(F.col(time_col))).alias("lo"),
        F.max(F.unix_micros(F.col(time_col))).alias("hi"),
    ).first()
    lo, hi = b["lo"], b["hi"]
    if lo is None:
        return
    span = hi - lo
    start = lo + int(span * min_train_frac)
    step = (hi - start) // n_splits if n_splits else 0
    t = F.unix_micros(F.col(time_col))
    for i in range(n_splits):
        cut = start + i * step
        end = hi + 1 if i == n_splits - 1 else start + (i + 1) * step
        yield (
            df.where(t < F.lit(cut)),
            df.where((t >= F.lit(cut)) & (t < F.lit(end))),
        )
