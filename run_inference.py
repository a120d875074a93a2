"""Inference entry point (counterpart of reference run_inference.py).

Usage: python run_inference.py <config.yaml> [k=v ...]
"""

from spherical_dyffusion_tpu.run_inference import main

if __name__ == "__main__":
    main()
