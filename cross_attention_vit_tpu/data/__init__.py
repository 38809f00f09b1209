from . import dataset, labels, loader, nifti, preprocess  # noqa: F401
