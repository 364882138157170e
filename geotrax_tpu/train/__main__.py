from geotrax_tpu.train.train import main

if __name__ == "__main__":
    main()
