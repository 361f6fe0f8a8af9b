"""Dev diagnostic: run the fused PFGST step on the current backend."""
import sys

sys.path.insert(0, '.')
sys.path.insert(0, 'tests')

import jax
import jax.numpy as jnp
import optax

from conftest import tiny_model_cfg  # noqa: E402
from pfst_tpu.models import build_train_model

print('backend', jax.default_backend(), flush=True)

uda_cfg = dict(
    uda=dict(type='PFGST', alpha=0.999, pseudo_threshold=0.98,
             pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
             imnet_feature_dist_lambda=0, mix='class', blur=True,
             color_jitter_strength=0.2, color_jitter_probability=0.2,
             print_grad_magnitude=False, thre_type='all',
             trg_loss_weight=1.0, use_decoded_feats=True,
             aux_losses=[dict(type='PFGSTLoss', kernel_size=3,
                              dilation=2, top_k=3,
                              weights={'src_pos': 0.1, 'src_neg': 0.1,
                                       'sim_pos': 0.1, 'sim_neg': 0.1,
                                       'src_pos_std': 0.1,
                                       'src_neg_std': 0.1},
                              sim_type='cosine', feat_level=None,
                              detach_unfold=True, downscale=0.5)]),
    model=tiny_model_cfg(),
    runner=dict(max_iters=100))

algo = build_train_model(uda_cfg)
tx = optax.adamw(6e-5, weight_decay=0.01)
rng = jax.random.PRNGKey(0)
B, H, W = 2, 64, 64
state = algo.init_state(rng, (B, H, W, 3), tx)
batch = dict(
    img=jax.random.normal(rng, (B, H, W, 3)),
    gt_semantic_seg=jax.random.randint(rng, (B, H, W), 0, 6),
    target_img=jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)),
    target_img_strong_aug=jax.random.normal(jax.random.PRNGKey(2),
                                            (B, H, W, 3)))
step = algo.make_train_step(tx, mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375], donate=False)
state2, log_vars, vis = step(state, batch, jax.random.PRNGKey(3))
print({k: float(v) for k, v in jax.device_get(log_vars).items()},
      flush=True)
print('OK', flush=True)
