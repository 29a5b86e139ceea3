"""Script layer: one argparse entry point per reference script.

Invoke as ``python -m autoencoder_based_image_compression_tpu.cli.<name>``.
Artifact paths follow the reference's hyperparameter-suffixed layout
(``utils/naming.py``).
"""
