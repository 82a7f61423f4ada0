from .losses import l1_loss, l2_loss, ssim, psnr, lidar_losses
from .schedule import expon_lr
from .trainer import TrainState, Trainer, make_optimizer
