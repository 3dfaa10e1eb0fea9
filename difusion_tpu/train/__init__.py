from . import losses, lif_dataset, lr_schedule, trainer

__all__ = ["losses", "lif_dataset", "lr_schedule", "trainer"]
