"""Multi-chip scaling: device meshes, frame-batch sharding, host streaming."""
