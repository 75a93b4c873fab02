"""Assembly operators: general slot-CSR path, lattice (DIA) fast path,
SoA element kernels, matrix-free K^H A K, block (nest) systems."""
