"""acf_tpu — a TPU-native adversarial collaborative-filtering framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
feay1234/Adversarial-Collaborative-Filtering (the reference repo): implicit-feedback
top-N recommendation with a model zoo (MF/BPR, NeuMF, SASRec, GRU4Rec, Caser, DREAM,
DRCF, IRGAN, APL, naive baselines) and first-class adversarial training (APR/FGSM
embedding perturbations, popularity discriminators, generator-discriminator minimax).

Everything hot runs on device: negative sampling, the epoch train loop (one
``lax.scan``), FGSM delta computation, and full-catalog leave-one-out evaluation
(tiled matmul + closed-form rank metrics). Multi-chip scaling goes through
``jax.sharding.Mesh`` + XLA collectives (see ``acf_tpu.parallel``).
"""

__version__ = "0.1.0"

from acf_tpu.data.datasets import Interactions, load_dataset  # noqa: F401
