"""16-device parallelism matrix + negative geometry tests.

The 8-device virtual mesh cannot express FSDPxTPxDP (8x2) or a 4-stage
pipeline x 4-way data — a 16-device subprocess runs those
(__graft_entry__._dryrun_matrix16). The negative tests assert that every
mesh/geometry misconfiguration fails with a clear error instead of a
silent wrong sharding.
"""

import os
import re
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_matrix16_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16").strip()
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "assert len(jax.devices()) == 16; "
        "import __graft_entry__ as g; g._dryrun_matrix16(16); "
        "print('MATRIX16 OK')"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    assert "MATRIX16 OK" in proc.stdout


# ---------------------------------------------------------------- negative

def test_mesh_indivisible_errors():
    from bert_multimodal_transformer_tpu.config import MeshConfig
    from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(MeshConfig(data_parallel=-1, model_parallel=3),
                  devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="needs more than"):
        make_mesh(MeshConfig(data_parallel=8, model_parallel=2),
                  devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="data axis"):
        make_mesh(MeshConfig(data_parallel=0, model_parallel=2),
                  devices=jax.devices()[:8])


def test_pp_mesh_overcommit_errors():
    from bert_multimodal_transformer_tpu.parallel.pp import make_pp_mesh

    with pytest.raises(ValueError, match="needs"):
        make_pp_mesh(8, data_parallel=2, devices=jax.devices()[:8])


def test_pp_microbatch_indivisible_errors():
    """A local batch that does not divide by n_micro must fail loudly at
    trace time, not truncate examples."""
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        MultimodalConfig,
    )
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification,
    )
    from bert_multimodal_transformer_tpu.parallel.pp import (
        PipelineTrainer,
        make_pp_mesh,
    )
    from bert_multimodal_transformer_tpu.training.optim import (
        make_optimizer,
    )

    cfg = dataclasses.replace(BertConfig.tiny(vocab_size=97),
                              num_hidden_layers=2)
    model = MagBertForSequenceClassification(
        cfg, MultimodalConfig(1.0, 0.0), visual_dim=3, acoustic_dim=4)
    mesh = make_pp_mesh(2, data_parallel=1, devices=jax.devices()[:2])
    pt = PipelineTrainer(model=model, tx=make_optimizer(1e-3, 10),
                         mesh=mesh, n_micro=4, donate=False)
    r = np.random.RandomState(0)
    bad = (r.randint(0, 97, (6, 8)).astype(np.int32),      # 6 % 4 != 0
           r.randn(6, 8, 3).astype(np.float32),
           r.randn(6, 8, 4).astype(np.float32),
           np.ones((6, 8), np.int32), np.zeros((6, 8), np.int32),
           r.randn(6).astype(np.float32))
    state = pt.init_state(jax.random.PRNGKey(0), bad)
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        pt.train_step(state, bad)


def test_uneven_layers_per_stage_errors():
    import dataclasses

    from bert_multimodal_transformer_tpu.config import (
        BertConfig,
        MultimodalConfig,
        XLNetConfig,
    )
    from bert_multimodal_transformer_tpu.models.bert import (
        MagBertForSequenceClassification,
    )
    from bert_multimodal_transformer_tpu.models.xlnet import (
        MagXLNetForSequenceClassification,
    )
    from bert_multimodal_transformer_tpu.parallel.pp import (
        PipelineTrainer,
        make_pp_mesh,
    )
    from bert_multimodal_transformer_tpu.parallel.pp_xlnet import (
        XLNetPipelineTrainer,
    )
    from bert_multimodal_transformer_tpu.training.optim import (
        make_optimizer,
    )

    mesh = make_pp_mesh(4, data_parallel=2, devices=jax.devices()[:8])
    tx = make_optimizer(1e-3, 10)
    bcfg = dataclasses.replace(BertConfig.tiny(), num_hidden_layers=6)
    with pytest.raises(ValueError, match="divide evenly"):
        PipelineTrainer(
            model=MagBertForSequenceClassification(
                bcfg, MultimodalConfig(1.0, 0.0), visual_dim=3,
                acoustic_dim=4),
            tx=tx, mesh=mesh, n_micro=2)
    xcfg = dataclasses.replace(XLNetConfig.tiny(), n_layer=6)
    with pytest.raises(ValueError, match="divide evenly"):
        XLNetPipelineTrainer(
            model=MagXLNetForSequenceClassification(
                xcfg, MultimodalConfig(1.0, 0.0, injection_index=1),
                visual_dim=3, acoustic_dim=4),
            tx=tx, mesh=mesh, n_micro=2)
