from . import filterbank, windows  # noqa: F401
from .filterbank import (  # noqa: F401
    FilterbankParams,
    analysis,
    analysis_half,
    analysis_snapshots_half,
    synthesis,
    synthesis_half,
    stft_analysis,
    hermitian_mirror,
    num_analysis_frames,
)
from . import pr_filterbank  # noqa: F401
from .pr_filterbank import PRFilterbankParams, pr_analysis, pr_synthesis  # noqa: F401
from . import complex_ops, recursions, sqrt_kernels  # noqa: F401
