from . import (augment, dataset, dataset_rsna, dicom, labels, loader,  # noqa: F401
               nifti, preprocess)
