#!/bin/bash
# S3DIS hdf5 blocks download (reference: prepareDataset_S3DIS.sh — which
# mkdir/cd's into ./Dataset/ShapeNet by mistake, quirk Q9; fixed here).
# Raw rooms for test-time inference additionally need the Stanford3dDataset
# (license-gated download) converted via:
#   python -c "from weaksuppointcloudseg_tpu.data.indoor3d import collect_indoor3d_data; \
#              collect_indoor3d_data('Stanford3dDataset_v1.2_Aligned_Version', './Dataset/S3DIS/stanford_indoor3d')"
set -euo pipefail

mkdir -p ./Dataset/S3DIS
cd ./Dataset/S3DIS

# HDF5 1m x 1m block shards (~1.6 GB)
wget https://shapenet.cs.stanford.edu/media/indoor3d_sem_seg_hdf5_data.zip
unzip -q indoor3d_sem_seg_hdf5_data.zip
rm indoor3d_sem_seg_hdf5_data.zip
