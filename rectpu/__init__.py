"""rectpu — a TPU-native CTR training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
leotimus/recommender-tensorflow (TF-1.12 Estimator CTR models on
MovieLens-100K): Linear, DNN, Wide&Deep and DeepFM over a feature-column
pipeline, with a jit-compiled train/eval/export loop, streaming AUC metrics,
sharded-embedding (EP) + data-parallel (DP) execution on a TPU mesh, a native
C++ input pipeline, and a serving/export path.

Layout (cf. SURVEY.md §7):
    data/      offline ETL (MovieLens download/process; BigQuery variant; synthetic)
    io/        input pipeline (C++ CSV loader + Python fallback)
    features/  feature schema: hashing / vocab / bucketize / identity -> dense ids
    ops/       Pallas kernels + XLA reference ops (FM cross, embedding lookup)
    models/    Linear, DNN, WideDeep, DeepFM as functional modules
    parallel/  mesh construction, sharding rules, EP embedding exchange
    train/     optimizers, metrics, checkpointing, the training loop
    serve/     export + load/predict honoring the reference serving schema
    trainers/  CLI entry points flag-compatible with the reference trainers
"""

__version__ = "0.1.0"
