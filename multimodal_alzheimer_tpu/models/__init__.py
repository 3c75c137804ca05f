from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
    SmallPETCNN,
    RandomBenchmarkAllCN,
)
from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.models.pet_models.pet_resnet_cnn import PETResNetCNN
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import TabularMLP
from multimodal_alzheimer_tpu.models.tabular_models.tabpfn import (
    TabPFNClassifier, TabPFNTransformer)
from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import AnatPETFusion
from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion import (
    PETTabularFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (
    TabularMRIFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (
    AllModalitiesFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import PETMRIEarlyFusion
from multimodal_alzheimer_tpu.models.fusion_models.featuremap_fusion import (
    PETMRIFeatureMapFusion,
)

__all__ = [
    "SmallPETCNN",
    "RandomBenchmarkAllCN",
    "AnatCNN",
    "PETResNetCNN",
    "TabPFNClassifier",
    "TabPFNTransformer",
    "TabularMLP",
    "AnatPETFusion",
    "PETTabularFusion",
    "TabularMRIFusion",
    "AllModalitiesFusion",
    "PETMRIEarlyFusion",
    "PETMRIFeatureMapFusion",
]
