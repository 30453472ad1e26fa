from geomconsistentfr_tpu.models.relightnet import RelightNet, RelightNetOutputs  # noqa: F401
from geomconsistentfr_tpu.models.patchgan import PatchGAN  # noqa: F401
