from fluidaudio_tpu.convert.parakeet import (
    convert_parakeet_state_dict,
    convert_nemo_file,
)

__all__ = ["convert_parakeet_state_dict", "convert_nemo_file"]
