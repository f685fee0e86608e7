from auxpm_tpu.models.base import Target  # noqa: F401
from auxpm_tpu.models.gaussian_toy import make_gaussian_toy  # noqa: F401
from auxpm_tpu.models.gp_classification import make_gp_classification  # noqa: F401
