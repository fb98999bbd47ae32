from .losses import (bce_probs, ce_as_torch, cosine_embedding_loss,
                     multihead_loss, clip_contrastive_loss)
from .metrics import (roc_auc, roc_curve, youden_threshold, accuracy_onehot,
                      precision_recall)
from .optim import make_optimizer, make_lr_schedule, freeze_label_tree
from .preempt import PreemptionGuard
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step

__all__ = [
    "bce_probs", "ce_as_torch", "cosine_embedding_loss", "multihead_loss",
    "clip_contrastive_loss", "roc_auc", "roc_curve", "youden_threshold",
    "accuracy_onehot", "precision_recall", "make_optimizer",
    "make_lr_schedule", "freeze_label_tree", "PreemptionGuard", "TrainState",
    "create_train_state", "make_train_step", "make_eval_step",
]
