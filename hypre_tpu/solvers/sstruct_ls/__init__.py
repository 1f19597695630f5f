from .split import SStructSplit, SplitOptions
