from xpt_mde_tpu.utils import se3
from xpt_mde_tpu.utils.util_class import (
    PathManager,
    DurationTime,
    RecoverableSkip,
    WrongInputError,
)
