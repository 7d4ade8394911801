from multimodalgame_tpu.models.sender import Sender  # noqa: F401
from multimodalgame_tpu.models.receiver import Receiver  # noqa: F401
from multimodalgame_tpu.models.baseline import Baseline  # noqa: F401
