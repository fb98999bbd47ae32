from .cohort import (load_cohort_table, select_with_label,
                     select_valid_fields, hospital_split, kfold_split,
                     stage_filter, EXCLUDED_PATIENT_IDS, build_cohort)
from .clinical import (clinical_vector, clinical_prompts, replace_fields,
                       CLINICAL_FEATURES)
from .tokenizer import ClipTokenizer, tokenize
from .bags import instance_dropout, pad_bag, bucket_for
from .ct_io import read_nifti, crop_or_pad_volume, hu_normalize
from .medical_io import (read_dicom_tags, write_dicom_ct_header, read_nrrd,
                         write_nrrd, nrrd_mask_to_zyx)
from .pipeline import MultimodalDataset, SyntheticCohort, BatchLoader

__all__ = [
    "load_cohort_table", "select_with_label", "select_valid_fields",
    "hospital_split", "kfold_split", "stage_filter",
    "EXCLUDED_PATIENT_IDS", "build_cohort", "clinical_vector",
    "clinical_prompts", "replace_fields", "CLINICAL_FEATURES",
    "ClipTokenizer", "tokenize", "instance_dropout", "pad_bag",
    "bucket_for", "read_nifti", "crop_or_pad_volume", "hu_normalize",
    "read_dicom_tags", "write_dicom_ct_header", "read_nrrd", "write_nrrd",
    "nrrd_mask_to_zyx",
    "MultimodalDataset", "SyntheticCohort", "BatchLoader",
]
