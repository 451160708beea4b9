"""sdfstudio-tpu: TPU-native neural implicit surface reconstruction."""

__version__ = "0.1.0"
