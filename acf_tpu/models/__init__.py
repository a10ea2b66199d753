from acf_tpu.models.base import PairwiseModel, SequenceModel  # noqa: F401
from acf_tpu.models.mf import MFBPR, PointwiseMF  # noqa: F401
