"""Pure numpy/pyarrow kernels — no Ray dependency in this subpackage."""
