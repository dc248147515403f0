from tds_tpu.model.joints import JointType
from tds_tpu.model.multibody import MultiBodyModel, MultiBodyBuilder, MultiBodyState
