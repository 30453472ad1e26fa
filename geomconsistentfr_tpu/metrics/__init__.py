from geomconsistentfr_tpu.metrics.image_metrics import (  # noqa: F401
    masked_dssim_matlab,
    masked_mse,
    matlab_ssim_map,
    psnr,
)
from geomconsistentfr_tpu.metrics.eval_multipie import evaluate_output_dir  # noqa: F401
