"""Data pipelines: UCCS / VGGFace2 parsing, GT assembly, loaders, face DBs."""
