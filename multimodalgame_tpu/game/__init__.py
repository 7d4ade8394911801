from multimodalgame_tpu.game.config import GameConfig  # noqa: F401
from multimodalgame_tpu.game.exchange import exchange, ExchangeOutputs  # noqa: F401
