# Vaihingen IRRG -> Potsdam IRRG (reverse direction of
# pots_irrg2vaih_irrg.py; mirrors the reference's
# vaih_irrg2pots_irrg.py which swaps source/target roots).
_base_ = ['./pots_irrg2vaih_irrg.py']

data_root_pots = 'data/Potsdam_IRRG_1024'
data_root_vaih = 'data/Vaihingen_IRRG_1024'
data = dict(
    # ship images uint8 + normalize on-device: 4x fewer wire
    # bytes past the (aging) host->device link — PERF.md r5;
    # set to False to restore host-side float32 Normalize
    device_normalize='uint8',
    train=dict(
        source=dict(data_root=data_root_vaih),
        target=dict(data_root=data_root_pots)),
    val=dict(data_root=data_root_pots),
    test=dict(data_root=data_root_pots))
