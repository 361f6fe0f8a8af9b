# ANNHead on R50-d8 (reference name; see annnet_r50-d8.py).
norm_cfg = dict(type='BN', requires_grad=True)
_base_ = ['./annnet_r50-d8.py']
