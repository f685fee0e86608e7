from auxpm_tpu.samplers.pm_mh import make_pm_mh  # noqa: F401
from auxpm_tpu.samplers.chain import run_chains  # noqa: F401
