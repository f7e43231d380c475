"""Operator set: tiler, spatial join, masks, stencils, composites,
dedup, similarity search, text analysis, multimodal plumbing."""
