"""Ray Data stage library: lowering of kernels onto Dataset transforms."""
