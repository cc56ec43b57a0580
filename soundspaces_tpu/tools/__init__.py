"""Tools (tier 7): native RIR synthesis, ambisonic decoding, PanoIR
rendering, observation-cache ingestion — the scripts/ + PanoIR/ surface of
the reference, rebuilt for the tensor-bank pipeline."""

from soundspaces_tpu.tools.rir_synth import (
    build_native_tracer,
    native_tracer_available,
    synth_rir_bank_native,
)
from soundspaces_tpu.tools.ambisonic import ambisonic_to_binaural, hrtf_decode_matrix
from soundspaces_tpu.tools.panoir import render_panoir_batch

__all__ = [
    "ambisonic_to_binaural",
    "build_native_tracer",
    "hrtf_decode_matrix",
    "native_tracer_available",
    "render_panoir_batch",
    "synth_rir_bank_native",
]
