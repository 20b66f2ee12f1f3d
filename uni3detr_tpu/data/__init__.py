from .datasets import build_dataset, collate_batch
from .pipeline import build_pipeline, Compose
