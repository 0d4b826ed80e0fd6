"""Shared stage-depth table for 2-D and inflated 3-D ResNets."""

RESNET_DEPTHS = {
    26: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
