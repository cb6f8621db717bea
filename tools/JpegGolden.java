// Independent JPEG decode oracle: decodes every *.jpg in the given
// directory with the JDK's bundled ImageIO JPEG reader (libjpeg-6b
// lineage, islow IDCT) and writes <name>.raw next to it:
//   1 byte  : number of channels (1 = gray, 3 = RGB)
//   4 bytes : big-endian height, 4 bytes: big-endian width
//   then height*width*channels bytes, row-major, RGB interleaved.
// Used by tools/gen_goldens.py to produce golden pixel hashes for the
// from-scratch decoder in markdown_query_ray/functions/jpeg_codec.py —
// the same build-time-oracle pattern as tools/xapian_oracle.cc.
//
// Run:  java tools/JpegGolden.java <dir>

import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import javax.imageio.ImageIO;

public class JpegGolden {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        File[] files = dir.listFiles((d, n) -> n.endsWith(".jpg"));
        java.util.Arrays.sort(files);
        for (File f : files) {
            BufferedImage img = ImageIO.read(f);
            int h = img.getHeight(), w = img.getWidth();
            Raster r = img.getRaster();
            int nc = r.getNumBands();
            File out = new File(dir, f.getName().replace(".jpg", ".raw"));
            try (DataOutputStream o = new DataOutputStream(
                     new FileOutputStream(out))) {
                o.writeByte(nc == 1 ? 1 : 3);
                o.writeInt(h);
                o.writeInt(w);
                int[] px = new int[nc];
                byte[] row = new byte[w * (nc == 1 ? 1 : 3)];
                for (int y = 0; y < h; y++) {
                    int k = 0;
                    for (int x = 0; x < w; x++) {
                        r.getPixel(x, y, px);
                        if (nc == 1) {
                            row[k++] = (byte) px[0];
                        } else {
                            row[k++] = (byte) px[0];
                            row[k++] = (byte) px[1];
                            row[k++] = (byte) px[2];
                        }
                    }
                    o.write(row, 0, k);
                }
            }
            System.out.println(f.getName() + " " + nc + "ch " + h + "x" + w);
        }
    }
}
