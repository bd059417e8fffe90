"""Base visloc dataset (reference dust3r_visloc/datasets/base_dataset.py)."""


class BaseVislocDataset:
    def __init__(self):
        self.maxdim = None
        self.patch_size = None

    def set_resolution(self, model):
        """model: AsymmetricCroCo3DStereo module definition."""
        self.maxdim = max(model.img_size)
        self.patch_size = model.patch_size

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError
