from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy, form_sigma  # noqa: F401
from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy  # noqa: F401
