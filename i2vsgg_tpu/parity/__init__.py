"""Reference-oracle subsystem: run the PyTorch reference on CPU for
quality-parity comparison (the other half of the north star).

The reference as shipped cannot run: its native ops are torch-0.4 FFI /
missing-source extensions (SURVEY.md §2.2, §8.8) and torchvision/easydict
are not in this image. ``refshim`` injects pure-torch equivalents with the
EXACT kernel semantics (already golden-tested in ops/) so the reference's
own Python model code executes unmodified on CPU.
"""
