#!/bin/bash
# ShapeNet part-segmentation dataset download (reference:
# prepareDataset_ShapeNet.sh). Layout consumed by data/shapenet.py:
#   Dataset/ShapeNet/hdf5_data/...          (train/val h5 + meta json/txt)
#   Dataset/ShapeNet/PartAnnotation/...     (raw test .pts/.seg)
#   Dataset/ShapeNet/testing_ply_file_list.txt
set -euo pipefail

mkdir -p ./Dataset/ShapeNet
cd ./Dataset/ShapeNet

# Original ShapeNetPart dataset (~1 GB; raw test .pts/.seg)
wget https://shapenet.cs.stanford.edu/ericyi/shapenetcore_partanno_v0.zip
unzip -q shapenetcore_partanno_v0.zip
rm shapenetcore_partanno_v0.zip

# HDF5 train/val shards (~346 MB)
wget https://shapenet.cs.stanford.edu/media/shapenet_part_seg_hdf5_data.zip
unzip -q shapenet_part_seg_hdf5_data.zip
rm shapenet_part_seg_hdf5_data.zip
