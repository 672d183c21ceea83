"""Default data/experiment directories (ref: src/prediff/utils/path.py)."""
import os

root_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
default_exps_dir = os.path.join(root_dir, "experiments")
default_dataset_dir = os.path.join(root_dir, "datasets")
default_dataset_sevir_dir = os.path.join(default_dataset_dir, "sevir")
default_dataset_sevirlr_dir = os.path.join(default_dataset_dir, "sevirlr")
default_pretrained_dir = os.path.join(root_dir, "pretrained")
