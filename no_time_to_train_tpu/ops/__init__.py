from no_time_to_train_tpu.ops.resize import resize, resize_hw, resize_matrix, resize_bilinear_dynamic
