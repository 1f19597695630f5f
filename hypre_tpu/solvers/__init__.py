from .krylov import pcg, gmres, bicgstab
