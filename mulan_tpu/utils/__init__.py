from mulan_tpu.utils.metrics import create_writer, image_grid
from mulan_tpu.utils.workdir import get_workdir

__all__ = ['create_writer', 'image_grid', 'get_workdir']
