"""CLI / experiment layer: the five entry points of the reference plus the
split tool, all as ``python -m lintransunet_tpu.cli.<name>``."""
