from .body_model import SMPLX, SMPLXData, SMPL, MANO
from .lbs import lbs, blend_shapes, vertices2joints, batch_rigid_transform
