from fluidaudio_tpu.convert.parakeet import (
    convert_parakeet_state_dict,
    convert_nemo_file,
)
from fluidaudio_tpu.convert.wespeaker import (
    convert_wespeaker_state_dict,
    convert_wespeaker_file,
)
from fluidaudio_tpu.convert.paraformer import (
    convert_paraformer_state_dict,
    convert_paraformer_file,
)
from fluidaudio_tpu.convert.sensevoice import (
    convert_sensevoice_state_dict,
    convert_sensevoice_file,
)
from fluidaudio_tpu.convert.sortformer import (
    convert_sortformer_state_dict,
    convert_sortformer_file,
)
from fluidaudio_tpu.convert.silero import (
    convert_silero_state_dict,
    convert_silero_file,
)
from fluidaudio_tpu.convert.pyannote import (
    convert_pyannote_state_dict,
    convert_pyannote_file,
    materialize_sinc_filters,
)

__all__ = [
    "convert_parakeet_state_dict",
    "convert_nemo_file",
    "convert_wespeaker_state_dict",
    "convert_wespeaker_file",
    "convert_pyannote_state_dict",
    "convert_pyannote_file",
    "materialize_sinc_filters",
    "convert_silero_state_dict",
    "convert_silero_file",
    "convert_sortformer_state_dict",
    "convert_sortformer_file",
    "convert_sensevoice_state_dict",
    "convert_sensevoice_file",
    "convert_paraformer_state_dict",
    "convert_paraformer_file",
]
