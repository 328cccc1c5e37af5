from .generate import laplace_1d, poisson_2d, poisson_3d, random_spd_csr
