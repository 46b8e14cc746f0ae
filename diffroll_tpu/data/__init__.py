"""Data layer: AMT datasets, rasterization, host pipeline."""

from .amt import MAESTRO, MAPS, PairedAudioMidi
from .custom import Custom, DoubleDataset
from .pipeline import DataLoader, collate
from .rasterize import rasterize_notes, roll_to_notes

__all__ = [
    "MAPS",
    "MAESTRO",
    "PairedAudioMidi",
    "Custom",
    "DoubleDataset",
    "DataLoader",
    "collate",
    "rasterize_notes",
    "roll_to_notes",
]
