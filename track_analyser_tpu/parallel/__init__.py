"""Parallelism tier: device meshes, batched library analysis, sharded ops."""
