"""Independent reference-parity oracle.

`reference_impl.py` is a standalone NumPy transcription of the reference
C++ hot-path semantics (serial loops, no vectorization) used as the
authoritative cross-check for the device solver. It shares NO code with
`kompass_core_tpu` — any semantic drift in the tensor program fails
`tests/test_oracle_parity.py`.
"""
