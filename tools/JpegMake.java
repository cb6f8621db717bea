// Independent JPEG ENCODER for subsampled test fixtures: reads every
// *.raw in the given directory (format written by JpegGolden.java:
// 1 byte channels, 4+4 bytes big-endian h/w, then row-major samples),
// encodes each with the JDK's ImageIO JPEG writer at the quality given
// as argv[1] (0..100), and writes <name>.jpg next to it. At typical
// qualities the JDK writer emits 4:2:0-subsampled YCbCr — real-world
// streams our from-scratch decoder must handle, produced by an encoder
// we did not write (so decoder tests against JpegGolden decodes of
// these files are doubly independent).
//
// Run:  java tools/JpegMake.java <quality> <dir> [progressive]

import java.awt.image.BufferedImage;
import java.io.DataInputStream;
import java.io.File;
import java.io.FileInputStream;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public class JpegMake {
    public static void main(String[] args) throws Exception {
        float q = Integer.parseInt(args[0]) / 100.0f;
        File dir = new File(args[1]);
        File[] files = dir.listFiles((d, n) -> n.endsWith(".raw"));
        java.util.Arrays.sort(files);
        for (File f : files) {
            int nc, h, w;
            byte[] data;
            try (DataInputStream in = new DataInputStream(
                     new FileInputStream(f))) {
                nc = in.readByte();
                h = in.readInt();
                w = in.readInt();
                data = in.readAllBytes();
            }
            BufferedImage img = new BufferedImage(
                w, h, nc == 1 ? BufferedImage.TYPE_BYTE_GRAY
                              : BufferedImage.TYPE_INT_RGB);
            int k = 0;
            for (int y = 0; y < h; y++) {
                for (int x = 0; x < w; x++) {
                    if (nc == 1) {
                        int v = data[k++] & 0xFF;
                        img.setRGB(x, y, (v << 16) | (v << 8) | v);
                    } else {
                        int r = data[k++] & 0xFF, g = data[k++] & 0xFF,
                            b = data[k++] & 0xFF;
                        img.setRGB(x, y, (r << 16) | (g << 8) | b);
                    }
                }
            }
            ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg")
                .next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(q);
            if (args.length > 2 && args[2].equals("progressive")) {
                p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            }
            File out = new File(dir, f.getName().replace(".raw", ".jpg"));
            try (ImageOutputStream os = ImageIO
                     .createImageOutputStream(out)) {
                wr.setOutput(os);
                wr.write(null, new IIOImage(img, null, null), p);
            }
            wr.dispose();
            System.out.println(out.getName() + " " + h + "x" + w);
        }
    }
}
