"""replay_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
sb-ai-lab/RePlay: data schema & preprocessing, train/test splitting, a model
zoo (classical JAX models + neural sequential models), offline metrics,
hyperparameter search, and production serving paths — built for TPU device
meshes rather than Spark clusters.
"""

__version__ = "0.1.0"
