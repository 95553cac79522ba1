"""Custom sources: HDF5 / Zarr split-planned readers (import-gated — the
decode libraries are not installed in this container; the split planning
and Arrow-batch plumbing are real and unit-tested)."""
