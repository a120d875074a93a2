"""Training entry point (counterpart of reference run.py).

Usage: python run.py [config.yaml] [experiment=<name>] [k=v ...]
"""

from spherical_dyffusion_tpu.train import main

if __name__ == "__main__":
    main()
