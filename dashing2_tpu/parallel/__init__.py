"""Multi-chip scaling: device meshes and sharded all-pairs comparison."""
