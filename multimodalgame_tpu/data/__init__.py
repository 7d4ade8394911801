from multimodalgame_tpu.data.descriptions import (  # noqa: F401
    clean_desc, read_data, embed, cbow, load_descriptions)
from multimodalgame_tpu.data.hdf5_loader import load_hdf5  # noqa: F401
