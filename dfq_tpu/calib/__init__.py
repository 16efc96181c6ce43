from dfq_tpu.calib.distill import DistillConfig, distill_data  # noqa: F401
from dfq_tpu.calib.calibrate import calibrate_ranges, estimate_stats  # noqa: F401
from dfq_tpu.calib.recon import ReconConfig, recon_data  # noqa: F401
from dfq_tpu.calib.distill_correct import bias_correction_distill  # noqa: F401
