from acf_tpu.models.base import PairwiseModel, SequenceModel  # noqa: F401
from acf_tpu.models.mf import MFBPR, PointwiseMF  # noqa: F401
from acf_tpu.models.neumf import NeuMF  # noqa: F401
from acf_tpu.models.sasrec import SASRec  # noqa: F401
from acf_tpu.models.gru4rec import GRU4Rec  # noqa: F401
from acf_tpu.models.dream import DREAM  # noqa: F401
from acf_tpu.models.drcf import DRCF  # noqa: F401
from acf_tpu.models.caser import Caser  # noqa: F401
from acf_tpu.models.irgan import IRGAN  # noqa: F401
from acf_tpu.models.apl import APL  # noqa: F401
from acf_tpu.models.naive import (  # noqa: F401
    AlreadyVisit, MostFrequentlyVisit, MostPopular, MostRecentlyVisit,
)
from acf_tpu.models.dsin import DSIN  # noqa: F401
