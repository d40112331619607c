from agdiff_tpu.eval.covmat import CovMatEvaluator, print_covmat_results  # noqa: F401
from agdiff_tpu.eval.covmat_linear import LinearCovMatEvaluator  # noqa: F401
from agdiff_tpu.eval.generate import GenerationRunner  # noqa: F401
