from flamo_tpu.optimize.dataset import (
    Dataset, DatasetColorless, get_dataloader, load_dataset,
    split_dataset, stack_loader,
)
from flamo_tpu.optimize.trainer import Trainer
from flamo_tpu.optimize import loss
from flamo_tpu.optimize.utils import generate_partitions
