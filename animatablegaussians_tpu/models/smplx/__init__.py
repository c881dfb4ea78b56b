from .body_model import SMPLX, SMPLXData, SMPL, SMPLH, MANO, FLAME
from .lbs import (lbs, blend_shapes, vertices2joints, batch_rigid_transform,
                  vertices2landmarks, find_dynamic_lmk_idx_and_bcoords)
from .vertex_ids import VERTEX_IDS, extra_joints_indices
