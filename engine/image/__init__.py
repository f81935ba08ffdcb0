"""Image payload operators: codecs, perceptual hash, decode stats."""
