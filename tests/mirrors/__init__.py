"""Minimal torch mirrors of diffusers module graphs, used as independent
cross-checks for the Flax implementations + converters (activation parity on
random weights — the technique of tests/test_convert.py's HF-parity tests,
extended to model families whose HF implementation (diffusers) is not
installed in this image).

These mirrors are written from the *published* diffusers architecture
(SD3Transformer2DModel, AutoencoderKL, FluxTransformer2DModel,
AutoencoderKLWan) with state-dict-compatible module naming, so the same
synthetic state dict drives both the torch mirror and our converter+Flax
model. Two independent implementations agreeing on random weights validates
both the module graph and the weight-name mapping.
"""
