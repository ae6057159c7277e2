"""End-to-end MAG-XLNet path: unigram tokenizer → left-pad packing →
trainer — the XLNet counterpart of the BERT overfit test."""

import numpy as np
import jax
import optax

from bert_multimodal_transformer_tpu.config import (
    MeshConfig,
    MultimodalConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.data import synthetic
from bert_multimodal_transformer_tpu.data.pipeline import (
    BatchIterator,
    convert_to_features,
)
from bert_multimodal_transformer_tpu.data.tokenization import (
    SimpleUnigramTokenizer,
)
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
)
from bert_multimodal_transformer_tpu.parallel.mesh import make_mesh
from bert_multimodal_transformer_tpu.training.trainer import Trainer

DV, DA, S, B = 3, 4, 14, 8


def test_xlnet_end_to_end_training_improves():
    tok = SimpleUnigramTokenizer.from_wordlist(synthetic.vocabulary())
    data = synthetic.make_dataset(visual_dim=DV, acoustic_dim=DA,
                                  n_train=32, n_dev=8, n_test=8, seed=11)
    split = convert_to_features(data["train"], S, tok, "xlnet",
                                visual_dim=DV, acoustic_dim=DA)
    # left-padded: first column should be mostly PAD for short examples
    assert (split.input_ids[:, 0] == tok.pad_token_id).any()
    # CLS last everywhere
    assert (split.input_ids[:, -1] == tok.vocab["<cls>"]).all()
    assert (split.segment_ids[:, -1] == 2).all()

    cfg = XLNetConfig.tiny(vocab_size=tok.vocab_size)
    mm = MultimodalConfig(beta_shift=1.0, dropout_prob=0.1,
                          injection_index=1)
    model = MagXLNetForSequenceClassification(
        cfg, mm, visual_dim=DV, acoustic_dim=DA)

    trainer = Trainer(model=model, tx=optax.adam(3e-3),
                      mesh=make_mesh(MeshConfig(data_parallel=1)))
    loader = BatchIterator(split, B, shuffle=True, drop_remainder=True,
                           seed=0)
    sample = next(iter(loader))[0]
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    losses = []
    for _ in range(15):
        state, loss = state, None
        state, loss = trainer.train_epoch(state, loader)
        losses.append(loss)
    assert losses[-1] < losses[0] / 2, losses

    # data-parallel consistency on the virtual mesh
    trainer_dp = Trainer(model=model, tx=optax.adam(3e-3),
                         mesh=make_mesh(MeshConfig(data_parallel=-1)),
                         donate=False)
    batch = split.take(np.arange(B)).as_tuple()
    s1 = trainer_dp.init_state(jax.random.PRNGKey(0), batch)
    _, l_dp = trainer_dp._train_step(s1, trainer_dp._put_batch(batch))
    assert np.isfinite(float(l_dp))
