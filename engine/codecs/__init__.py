"""Codec kernels. Registry lives in :mod:`engine.codecs.registry`."""
