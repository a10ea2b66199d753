from acf_tpu.adversarial.fgsm import FGSMAdversarial  # noqa: F401
from acf_tpu.adversarial.popularity import PopularityAdversarial  # noqa: F401
