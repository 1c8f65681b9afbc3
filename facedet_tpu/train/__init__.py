from facedet_tpu.train.yolo_train import (
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
    yolo_loss,
)
from facedet_tpu.train.yolo_trainer import YoloDataset, YoloTrainer
from facedet_tpu.train.rtdetr_train import RtDetrTrainer, rtdetr_loss
from facedet_tpu.train.checkpoint import CheckpointManager
