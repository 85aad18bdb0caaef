"""Classic-NBFNet task end to end (train + eval) on a synthetic KG."""

from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
from ultra_torchdrug_tpu.engine.engine import Engine
from ultra_torchdrug_tpu.models.classic_nbfnet import classic_nbfnet_config
from ultra_torchdrug_tpu.tasks.task import ClassicNBFNetTask, TaskConfig


def test_classic_task_train_eval(tmp_path):
    ds = synthetic_transductive(num_nodes=30, num_edges=220, num_relations=4)
    nbf = classic_nbfnet_config(
        input_dim=8, hidden_dims=(8, 8), num_relations=ds.num_relations,
        aggregate_func="sum", layer_norm=True,
    )
    task = ClassicNBFNetTask(ds, nbf, TaskConfig(num_negative=6))
    eng = Engine(task, batch_size=8, lr=5e-3, work_dir=str(tmp_path),
                 log_interval=1000)
    eng.train(num_epoch=1, batch_per_epoch=5)
    m = eng.evaluate("valid")
    assert 0 < m["mrr"] <= 1
