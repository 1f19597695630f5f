from .pfmg import PFMG, PFMGOptions
