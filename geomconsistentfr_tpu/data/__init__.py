from geomconsistentfr_tpu.data.celebahq import (  # noqa: F401
    CelebAHQRelightingData,
    SyntheticFaceData,
    build_cache,
)
from geomconsistentfr_tpu.data.multipie import MultiPIEEvalData  # noqa: F401
