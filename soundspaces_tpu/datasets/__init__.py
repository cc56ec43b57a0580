"""Episode datasets: the reference's gzip-JSON AudioNav / SemanticAudioNav
episode files, loaded host-side into device EpisodeBanks."""

from soundspaces_tpu.datasets.audionav import (
    AudioNavDataset,
    Episode,
    episodes_to_bank,
)

__all__ = ["AudioNavDataset", "Episode", "episodes_to_bank"]
