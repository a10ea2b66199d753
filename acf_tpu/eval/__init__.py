from acf_tpu.eval.metrics import metrics_from_position, mean_metrics  # noqa: F401
from acf_tpu.eval.full_rank import FullRankEvaluator, EvalResult  # noqa: F401
