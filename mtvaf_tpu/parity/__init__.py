"""Real-data accuracy-parity harness (``mtvaf-parity``).

The north-star acceptance criterion (BASELINE.json) is acc/macro-F1 within
0.3 pts of the PyTorch reference on real Twitter2015/2017 for the five
benchmark configs — data this image cannot ship.  This package makes that
measurement TURNKEY for anyone who has the data: one command stages the
reference (/root/reference layout), runs each config through BOTH the
reference's own ``MTVAF_training.py`` and this framework's CLI, and emits
the per-config parity table with the 0.3-pt verdict.

In-image (no real data) the same command runs end-to-end on the synthetic
generators (``--dry_run``) to validate the plumbing: staging, dependency
stubbing, both trainers, metric extraction and the report.

Host-side torch-only code; nothing here is on the compute path.
"""
