"""spherical_dyffusion_tpu — TPU-native Spherical DYffusion climate emulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Rose-STL-Lab/spherical-dyffusion (NeurIPS 2024): SFNO backbone with native
spherical-harmonic transforms, the two-stage DYffusion framework, an
ACE-style autoregressive rollout engine, FV3GFS data pipeline, probabilistic
evaluation, and mesh-sharded training/inference.
"""

__version__ = "0.1.0"
