from mulan_tpu.data.pipeline import (create_dataset, create_one_time_eval_dataset)

__all__ = ['create_dataset', 'create_one_time_eval_dataset']
